"""Sources: table readers + deterministic synthetic `pages` generator."""
