"""Property tests for the codec layer (no Spark session needed).

Mirrors the reference's randomized property-test strategy
(quantized_summary.rs:408-598: random dimensions/values, exactness
assertions) with hypothesis-generated inputs over the varint/delta codecs —
the layer every posting row passes through twice (build encode, query
decode), where a silent corner-case corruption would poison results at any
scale.
"""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from seismic_spark import codec

ids_row = st.lists(
    st.integers(min_value=0, max_value=2**62 - 1), min_size=0, max_size=200
).map(lambda xs: np.unique(np.asarray(xs, dtype=np.uint64)))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varint_roundtrip(xs):
    v = np.asarray(xs, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(v)), v)


@settings(max_examples=200, deadline=None)
@given(ids_row)
def test_delta_roundtrip(ids):
    assert np.array_equal(codec.delta_decode(codec.delta_encode(ids)), ids)


@settings(max_examples=100, deadline=None)
@given(st.lists(ids_row, min_size=0, max_size=30))
def test_delta_multi_roundtrip(rows):
    """encode_multi ∘ decode_multi is the identity, and each encoded slice
    equals the single-row encoder's output (so single- and multi-row paths
    can never diverge)."""
    counts = np.asarray([r.size for r in rows], dtype=np.int64)
    flat = (
        np.concatenate(rows)
        if counts.sum()
        else np.empty(0, dtype=np.uint64)
    )
    buf, lens = codec.delta_encode_multi(flat, counts)
    ends = np.cumsum(lens)
    starts = ends - lens
    for i, r in enumerate(rows):
        assert buf[starts[i] : ends[i]] == codec.delta_encode(r)
    dec, cnts = codec.delta_decode_multi(
        [buf[s:e] for s, e in zip(starts, ends)]
    )
    assert np.array_equal(cnts, counts)
    assert np.array_equal(dec, flat)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=100,
    ),
    st.booleans(),
)
@example(
    # f32-subnormal boundary: (hi-lo)/255 underflows to f32 zero, forcing
    # the degenerate one-value path — in ceil mode it must collapse to hi
    vals=[1.1754943508222875e-38, 1.175494351e-38],
    ceil=True,
)
def test_quantize_u8_bounds(vals, ceil):
    """Dequantized codes stay within one quantum of the input; with
    ceil=True they never undershoot (the block-skipping upper-bound
    contract); with ceil=False they match the reference's nearest rounding
    (utils.rs:68-90)."""
    v = np.asarray(vals, dtype=np.float64)
    codes, lo, quant = codec.quantize_u8(v, ceil=ceil)
    deq = codec.dequantize_u8(codes, lo, quant)
    q = quant if quant > 0 else 0.0
    # tolerance: affine params and dequant run in f32 — allow f32 ulps
    tol = 1e-9 + np.abs(v) * 2e-7
    assert np.all(deq >= v - (0.0 if ceil else q / 2) - tol)
    assert np.all(deq <= v + q + tol)
    if ceil:
        # the upper-bound contract is EXACT (quantize_u8 verifies deq ≥ v in
        # the same f32 arithmetic the scorer uses and bumps codes until it
        # holds) — no tolerance here
        assert np.all(deq.astype(np.float64) >= v)


# -------------------------------------------------- duplicate-query merge --

qvec_entries = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # small id space forces dups
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False, width=64,
        ),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(qvec_entries, st.randoms(use_true_random=False))
def test_merge_dup_qvecs_permutation_invariant(entries, rnd):
    """search._merge_dup_qvecs must return bitwise-identical merged vectors
    for ANY permutation of the caller's (term, weight) pairs — this is the
    property the fast-path/in-plan bitwise-identity contract rests on for
    duplicate-term queries (both paths consume the one merged result)."""
    from seismic_spark import search as srch

    def run(pairs):
        t = np.asarray([p[0] for p in pairs], dtype=np.int64)
        w = np.asarray([p[1] for p in pairs], dtype=np.float64)
        out_t, out_w = srch._merge_dup_qvecs({"q": (t, w)})["q"]
        return out_t.tolist(), out_w.tolist()

    base = run(entries)
    shuffled = list(entries)
    rnd.shuffle(shuffled)
    assert run(shuffled) == base  # == on floats: bitwise, not approx
    # merged ids are strictly ascending and duplicate-free
    assert base[0] == sorted(set(base[0]))
