"""S1/S2/S3 scans (SURVEY.md §2.1) — round-trips against the reference's
exact on-disk layouts, including a byte-level oracle for the inner format
written with the same struct calls as scripts/convert_json_to_inner_format.py.
"""

import gzip
import io
import json
import struct
import tarfile

import numpy as np
import pytest

from seismic_spark.sources.vectors import (
    decode_seismic_bin,
    encode_seismic_bin,
    read_jsonl_vectors,
    read_seismic_bin,
    read_tar_jsonl,
    write_seismic_bin,
)

DOCS = [
    # (id as written, tokens->weights, content)
    ("d0", {"apple": 1.5, "zebra": 0.25, "mango": 3.0}, "apple zebra"),
    (7, {"apple": 2.0}, None),  # integer id — json_utils.rs untagged union
    ("d2", {"kiwi": 0.5, "apple": 0.125}, "kiwi text"),
]


def _jsonl_lines():
    out = []
    for did, vec, content in DOCS:
        obj = {"id": did, "vector": vec}
        if content is not None:
            obj["content"] = content
        out.append(json.dumps(obj))
    return out


def _expect_rows():
    rows = {}
    for did, vec, content in DOCS:
        toks = sorted(vec)
        rows[str(did)] = (toks, [vec[t] for t in toks], content)
    return rows


def _check_parsed(df):
    got = {r["doc_id"]: r for r in df.collect()}
    want = _expect_rows()
    assert set(got) == set(want)
    for did, (toks, ws, content) in want.items():
        assert got[did]["terms"] == toks
        assert got[did]["weights"] == pytest.approx(ws)
        assert got[did]["content"] == content


def test_read_jsonl_vectors(spark, tmp_path):
    p = tmp_path / "vecs.jsonl"
    p.write_text("\n".join(_jsonl_lines()) + "\n")
    _check_parsed(read_jsonl_vectors(spark, str(p)))


def test_read_jsonl_vectors_gz(spark, tmp_path):
    p = tmp_path / "vecs.jsonl.gz"
    p.write_bytes(gzip.compress(("\n".join(_jsonl_lines()) + "\n").encode()))
    _check_parsed(read_jsonl_vectors(spark, str(p)))


def _make_tar_gz(path, members):
    """members: list of (name, text)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, text in members:
            data = text.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    path.write_bytes(gzip.compress(buf.getvalue()))


def test_read_tar_jsonl_first_member(spark, tmp_path):
    lines = _jsonl_lines()
    p = tmp_path / "docs.tar.gz"
    # reference reads ONLY the first member (inverted_index_wrapper.rs:585)
    _make_tar_gz(p, [("docs.jsonl", "\n".join(lines)),
                     ("ignored.jsonl", json.dumps({"id": "X", "vector": {"a": 1.0}}))])
    _check_parsed(read_tar_jsonl(spark, str(p)))


def test_read_tar_jsonl_all_members(spark, tmp_path):
    lines = _jsonl_lines()
    p = tmp_path / "docs.tar.gz"
    _make_tar_gz(p, [("a.jsonl", "\n".join(lines[:2])), ("b.jsonl", lines[2])])
    _check_parsed(read_tar_jsonl(spark, str(p), first_member_only=False))


def _reference_bytes(vectors):
    """Byte oracle: the exact writer from convert_json_to_inner_format.py:10-27."""
    out = io.BytesIO()
    out.write(len(vectors).to_bytes(4, "little", signed=False))
    for pairs in vectors:
        out.write(len(pairs).to_bytes(4, "little", signed=False))
        for c, _ in pairs:
            out.write(int(c).to_bytes(4, "little", signed=False))
        for _, v in pairs:
            out.write(bytearray(struct.pack("f", v)))
    return out.getvalue()


VECS = [
    [(0, 1.5), (3, 0.25), (9, 2.0)],
    [],  # empty vector record
    [(2, 0.125)],
    [(1, 4.0), (5, 0.5), (6, 1.0), (8, 0.75)],
]


def test_bin_codec_matches_reference_bytes():
    ref = _reference_bytes(VECS)
    mine = encode_seismic_bin(
        [np.array([c for c, _ in v], dtype=np.int64) for v in VECS],
        [np.array([x for _, x in v], dtype=np.float32) for v in VECS],
    )
    assert mine == ref
    lens, ids, vals = decode_seismic_bin(ref)
    assert lens.tolist() == [len(v) for v in VECS]
    assert ids.tolist() == [c for v in VECS for c, _ in v]
    assert vals.tolist() == [x for v in VECS for _, x in v]


def test_read_seismic_bin_multifile_ids(spark, tmp_path):
    """Sequential doc ids across path-ordered shards, like the reference
    reading one concatenated file."""
    (tmp_path / "part-00000.bin").write_bytes(_reference_bytes(VECS[:2]))
    (tmp_path / "part-00001.bin").write_bytes(_reference_bytes(VECS[2:]))
    got = {
        r["doc_id"]: (r["terms"], r["weights"])
        for r in read_seismic_bin(spark, str(tmp_path)).collect()
    }
    assert sorted(got) == [0, 1, 2, 3]
    for i, v in enumerate(VECS):
        assert got[i][0] == [c for c, _ in v]
        assert got[i][1] == pytest.approx([x for _, x in v])


def test_build_from_vectors_jsonl(spark, tmp_path):
    """S1 reader → build_from_vectors (string terms, string|int ids) →
    search ≡ bruteforce (exact-contract default config)."""
    from seismic_spark.index import SeismicSparkIndex

    p = tmp_path / "vecs.jsonl"
    p.write_text("\n".join(_jsonl_lines()) + "\n")
    vecs = read_jsonl_vectors(spark, str(p)).select("doc_id", "terms", "weights")
    idx = SeismicSparkIndex.build_from_vectors(spark, vecs)
    # external string ids kept on docmap
    ext = {r["ext_id"] for r in idx.docmap.collect()}
    assert ext == {"d0", "7", "d2"}
    q = [("q0", ["apple", "zebra"], [1.0, 3.0])]
    got = idx.search("q0", *q[0][1:], k=3).collect()
    want = idx.bruteforce(q, k=3).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
        (r["rank"], r["doc_id"], r["score"]) for r in want
    ]
    # scores: d0 = 1.5 + 3*0.25 = 2.25 > id(7) = 2.0 > d2 = 0.125
    assert [r["score"] for r in got] == pytest.approx([2.25, 2.0, 0.125])
    # P6 remap: internal BIGINT ids -> original external string ids
    remapped = idx.remap_results(idx.search("q0", *q[0][1:], k=3))
    assert [(r["rank"], r["doc_id"]) for r in remapped.orderBy("rank").collect()] == [
        (1, "d0"), (2, "7"), (3, "d2")
    ]


def test_build_from_vectors_bin_int_ids(spark, tmp_path):
    """S3 reader → build_from_vectors: component ids pass through untouched
    (identity vocab), search ≡ bruteforce."""
    from seismic_spark.index import SeismicSparkIndex

    (tmp_path / "all.bin").write_bytes(_reference_bytes(VECS))
    vecs = read_seismic_bin(spark, str(tmp_path))
    idx = SeismicSparkIndex.build_from_vectors(spark, vecs)
    assert idx.docmap is None
    # identity vocab: term string is the component id
    vrow = {r["term"]: r["term_id"] for r in idx.vocab.collect()}
    assert all(int(t) == i for t, i in vrow.items())
    q = [("q0", ["0", "5", "9"], [1.0, 2.0, 1.0])]
    got = idx.search("q0", *q[0][1:], k=4).collect()
    want = idx.bruteforce(q, k=4).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    # doc0 = 1.5 + 2.0 = 3.5; doc3 = 2*0.5 = 1.0
    by_doc = {r["doc_id"]: r["score"] for r in got}
    assert by_doc[0] == pytest.approx(3.5)
    assert by_doc[3] == pytest.approx(1.0)


def test_write_seismic_bin_roundtrip(spark, tmp_path):
    fwd = spark.createDataFrame(
        [(i, [c for c, _ in v], [float(x) for _, x in v]) for i, v in enumerate(VECS)],
        "doc_id BIGINT, terms ARRAY<INT>, weights ARRAY<FLOAT>",
    )
    out = tmp_path / "export"
    write_seismic_bin(fwd, str(out), shards=2)
    back = {
        r["doc_id"]: (r["terms"], r["weights"])
        for r in read_seismic_bin(spark, str(out)).collect()
    }
    assert sorted(back) == [0, 1, 2, 3]
    for i, v in enumerate(VECS):
        assert back[i][0] == [c for c, _ in v]
        assert back[i][1] == pytest.approx([x for _, x in v])
