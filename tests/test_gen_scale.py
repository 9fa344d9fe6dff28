"""Properties the 10x scale-up generator must hold for the scale proof
to be meaningful (tools/gen_scale.py): the duplicate RATE stays constant
as rows grow — within-shard similarity structure is preserved exactly,
cross-shard similarity is destroyed — and FK integrity survives the
key-offset sharding.  Pure pyarrow/numpy, no Spark session needed.
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale2x"))
    subprocess.run(
        [sys.executable, "tools/gen_scale.py",
         "--src", SRC, "--dst", dst, "--shards", "2"],
        check=True, capture_output=True, timeout=300,
    )
    return dst


def test_row_counts_scale(scaled):
    for name in ["documents", "embeddings", "lineitem", "orders", "customer"]:
        n_src = pq.read_metadata(f"{SRC}/{name}.parquet").num_rows
        n_dst = pq.read_metadata(f"{scaled}/{name}.parquet").num_rows
        assert n_dst == 2 * n_src, name
    # fixed-cardinality dims do NOT scale
    for name in ["nation", "region"]:
        assert (
            pq.read_metadata(f"{scaled}/{name}.parquet").num_rows
            == pq.read_metadata(f"{SRC}/{name}.parquet").num_rows
        )


def test_documents_dup_structure_per_shard(scaled):
    """Injective token renaming: within-shard exact-dup group sizes are
    identical to the source; across shards, no text collides."""
    src = pq.read_table(f"{SRC}/documents.parquet")
    dst = pq.read_table(f"{scaled}/documents.parquet")
    n = src.num_rows
    texts = dst.column("text").to_pylist()
    shard0, shard1 = texts[:n], texts[n:]

    def group_sizes(ts):
        sizes: dict[str, int] = {}
        for t in ts:
            sizes[t] = sizes.get(t, 0) + 1
        return sorted(sizes.values())

    assert shard0 == src.column("text").to_pylist()
    assert group_sizes(shard1) == group_sizes(shard0)
    # A doc whose every word escapes the ~35% substitution survives
    # verbatim across shards (short all-common-word texts — the analog
    # of boilerplate recurring in a real crawl). Tolerate a <1% tail;
    # anything larger would distort the linear-scaling measurement.
    overlap = set(shard0) & set(shard1)
    assert len(overlap) / len(set(shard0)) < 0.01, overlap


def test_documents_jaccard_preserved_within_shard(scaled):
    """Word-level Jaccard between any two docs is invariant under the
    per-shard injective substitution."""
    src = pq.read_table(f"{SRC}/documents.parquet")
    dst = pq.read_table(f"{scaled}/documents.parquet")
    n = src.num_rows
    s_texts = src.column("text").to_pylist()
    d_texts = dst.column("text").to_pylist()[n:]

    def jac(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    for i, j in [(0, 1), (2, 3), (0, n - 1), (5, 17)]:
        assert jac(d_texts[i], d_texts[j]) == pytest.approx(
            jac(s_texts[i], s_texts[j]), abs=1e-12
        )


def test_embeddings_geometry_preserved_within_shard(scaled):
    """Signed permutation is orthogonal: norms and pairwise dot products
    inside the new shard equal the source's; cross-shard cosine of the
    'same' vector is scrambled (not ~1)."""
    src = np.array(
        pq.read_table(f"{SRC}/embeddings.parquet").column("embedding").to_pylist(),
        dtype=np.float64,
    )
    dst_t = pq.read_table(f"{scaled}/embeddings.parquet")
    dst = np.array(dst_t.column("embedding").to_pylist(), dtype=np.float64)
    n = src.shape[0]
    shard1 = dst[n:]
    np.testing.assert_allclose(
        np.linalg.norm(shard1, axis=1), np.linalg.norm(src, axis=1), rtol=1e-5
    )
    for i, j in [(0, 1), (3, 9), (10, n - 1)]:
        assert shard1[i] @ shard1[j] == pytest.approx(src[i] @ src[j], rel=1e-5)
    cos = [
        (src[i] @ shard1[i])
        / (np.linalg.norm(src[i]) * np.linalg.norm(shard1[i]) + 1e-12)
        for i in range(min(n, 50))
    ]
    assert float(np.mean(np.abs(cos))) < 0.9


def test_fk_integrity_after_sharding(scaled):
    """Every FK edge the warehouse queries join on — including the
    part/supplier edges, whose bases come from the PK tables, not the
    referencing table's own column max."""
    orders = pq.read_table(f"{scaled}/orders.parquet")
    customer = pq.read_table(f"{scaled}/customer.parquet")
    custkeys = set(customer.column("c_custkey").to_pylist())
    assert set(orders.column("o_custkey").to_pylist()) <= custkeys
    lineitem = pq.read_table(f"{scaled}/lineitem.parquet")
    orderkeys = set(orders.column("o_orderkey").to_pylist())
    assert set(lineitem.column("l_orderkey").to_pylist()) <= orderkeys
    partkeys = set(
        pq.read_table(f"{scaled}/part.parquet").column("p_partkey").to_pylist()
    )
    assert set(lineitem.column("l_partkey").to_pylist()) <= partkeys
    suppkeys = set(
        pq.read_table(f"{scaled}/supplier.parquet").column("s_suppkey").to_pylist()
    )
    assert set(lineitem.column("l_suppkey").to_pylist()) <= suppkeys


def test_fk_base_from_pk_table(tmp_path):
    """A PK value with no referencing row must not misalign shard FKs:
    customer has an extra unreferenced max key, so deriving orders'
    o_custkey base from orders' own max would collide shard 1 FKs with
    shard 0 customers (or orphan them)."""
    import pyarrow as pa

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    pq.write_table(
        pa.table({"c_custkey": [1, 2, 9], "c_name": ["a", "b", "unref"]}),
        f"{src}/customer.parquet",
    )
    pq.write_table(
        pa.table({"o_orderkey": [10, 11], "o_custkey": [1, 2]}),
        f"{src}/orders.parquet",
    )
    sys.path.insert(0, "/root/repo")
    from tools.gen_scale import domain_base, scale_keyed

    base = domain_base(str(src), "customer", "c_custkey")
    assert base == 10  # from customer's max (9), not orders' max FK (2)
    scale_keyed(str(src), str(dst), "customer", {"c_custkey": base}, 2)
    scale_keyed(
        str(src), str(dst), "orders",
        {"o_orderkey": domain_base(str(src), "orders", "o_orderkey"),
         "o_custkey": base},
        2,
    )
    custkeys = set(
        pq.read_table(f"{dst}/customer.parquet").column("c_custkey").to_pylist()
    )
    fks = set(pq.read_table(f"{dst}/orders.parquet").column("o_custkey").to_pylist())
    assert fks <= custkeys
    assert fks == {1, 2, 11, 12}


def test_subst_vocab_injective_against_colliding_vocab():
    """A source word that happens to look like another word's rename
    ('foox1' vs renamed 'foo') must not merge with it after
    substitution — the rename re-suffixes until free."""
    sys.path.insert(0, "/root/repo")
    from tools.gen_scale import _subst_vocab

    vocab = [f"w{i}" for i in range(200)]
    vocab += [w + "x1" for w in vocab]  # every rename candidate occupied
    vocab = sorted(set(vocab))
    sub = _subst_vocab(vocab, 1)
    assert sub  # the 35% hash band picked something
    renamed = set(sub.values())
    kept = set(vocab) - set(sub)
    assert len(renamed) == len(sub)  # injective among renames
    assert not (renamed & kept)  # injective against kept tokens
    assert not (renamed & set(vocab))  # never re-enters the vocabulary


def test_deterministic(scaled, tmp_path):
    """Same seed -> byte-identical documents shard."""
    dst2 = str(tmp_path / "again")
    subprocess.run(
        [sys.executable, "tools/gen_scale.py",
         "--src", SRC, "--dst", dst2, "--shards", "2"],
        check=True, capture_output=True, timeout=300,
    )
    a = pq.read_table(f"{scaled}/documents.parquet")
    b = pq.read_table(f"{dst2}/documents.parquet")
    assert a.equals(b)
    ea = pq.read_table(f"{scaled}/embeddings.parquet")
    eb = pq.read_table(f"{dst2}/embeddings.parquet")
    assert ea.equals(eb)
