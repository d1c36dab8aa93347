"""Model-conformance suite over the shared FencedStoreLifecycle (r14
verdict #5): seeded random op sequences — append / replay / fold /
crash-injected fold / auto_compact / rebucket / reopen — driven
GENERICALLY through one adapter protocol over all four lifecycle
stores (GramRegistry, SourceCountRegistry, LexicalIndex, AnnIndex),
with a pure-Python model as the contract. The deltalite protocol log
has its hypothesis interleaving suite; the r12 tombstone drift proved
shared contracts need shared tests, and this is that suite for the
store lifecycle: after EVERY op the store's resolved read must equal
the model, a crash injected at the fold marker must lose nothing
(marker-first discipline — either the marker write fails before the
overwrite, or a written marker guards an unfolded-but-intact store),
and a reopened instance must route by the persisted fan-out."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _boom(*a, **k):
    raise RuntimeError("injected fold crash")


class _Adapter:
    """Protocol: concrete adapters define make/append/read plus the
    fold-marker crash point; the model is rebuilt from the applied
    batch set (replays leave it unchanged by construction)."""

    REBUCKET_KNOB = False  # compact(n_buckets=...) supported
    FIRST_K = 1

    def __init__(self, spark, tmp_path):
        self.spark = spark
        self.path = str(tmp_path / "store")
        self.applied: set[int] = set()
        self._created = False

    def _initial_nb(self, nb):
        # explicit fan-out only on FIRST creation: a reopen after a
        # rebucket must defer to the persisted layout (an explicit
        # conflicting value rightly raises — pinned in r14's tests)
        out = None if self._created else nb
        self._created = True
        return out

    # concrete adapters implement:
    def make(self):  # pragma: no cover - protocol
        raise NotImplementedError

    def append(self, store, k: int) -> None:  # pragma: no cover
        raise NotImplementedError

    def read(self, store) -> dict:  # pragma: no cover
        raise NotImplementedError

    def model(self) -> dict:  # pragma: no cover
        raise NotImplementedError

    def fold(self, store, n_buckets=None) -> None:
        if n_buckets is not None:
            store.compact(n_buckets=n_buckets)
        else:
            store.compact()

    def crash_point(self) -> str:
        return "record_folded_ids"  # the set-ledger stores' marker

    def auto(self, store):
        store.auto_compact(max_batches=2)


class GramAdapter(_Adapter):
    REBUCKET_KNOB = True

    def make(self):
        from propulsion_spark.streaming.substring_dedup import GramRegistry

        return GramRegistry(
            self.spark, self.path, n_buckets=self._initial_nb(4)
        )

    def _payload(self, k):
        # gram (7,7) recurs in every batch: exercises the sum/min fold
        return [
            (k, 0, k + 1, 1000 + k, 0),
            (7, 7, 1, 2000 + k, k),
        ]

    def append(self, store, k):
        store.append_counts(
            self.spark.createDataFrame(
                self._payload(k),
                "gh long, gh2 int, cnt long, first_doc long, first_start long",
            ),
            k,
        )

    def read(self, store):
        return {
            (r["gh"], r["gh2"]): (
                r["cnt"], r["first_doc"], r["first_start"],
            )
            for r in store.totals().collect()
        }

    def model(self):
        out = {}
        for k in self.applied:
            for gh, gh2, cnt, fd, fs in self._payload(k):
                c, mfd, mfs = out.get((gh, gh2), (0, None, None))
                first = min(
                    x for x in [(fd, fs), (mfd, mfs)] if x[0] is not None
                )
                out[(gh, gh2)] = (c + cnt, first[0], first[1])
        return out


class SourceCountAdapter(_Adapter):
    REBUCKET_KNOB = True

    def make(self):
        from propulsion_spark.streaming.source_cap import SourceCountRegistry

        return SourceCountRegistry(
            self.spark, self.path, n_buckets=self._initial_nb(4)
        )

    def _payload(self, k):
        return [("s%d" % (k % 3), k + 1), ("shared", 2)]

    def append(self, store, k):
        store.append_counts(
            self.spark.createDataFrame(
                self._payload(k), "source string, cnt long"
            ),
            k,
        )

    def read(self, store):
        return {
            r["source"]: r["src_cnt"] for r in store.totals().collect()
        }

    def model(self):
        out = {}
        for k in self.applied:
            for s, c in self._payload(k):
                out[s] = out.get(s, 0) + c
        return out


class LexicalAdapter(_Adapter):
    REBUCKET_KNOB = True
    FIRST_K = 1

    def make(self):
        from propulsion_spark.pipelines.lexical_index import LexicalIndex

        return LexicalIndex(
            self.spark, self.path, n_buckets=self._initial_nb(4)
        )

    def _docs(self, k):
        return self.spark.createDataFrame(
            [
                (100 * k + j, "alpha filler%d word%d" % (k, j))
                for j in range(2)
            ],
            "doc_id long, text string",
        )

    def append(self, store, k):
        store.append(self._docs(k), batch_id=k)

    def read(self, store):
        if store.n_batches() == 0:
            return set()
        return {
            r["doc_id"]
            for r in store.search(("alpha",), k=10_000).collect()
        }

    def model(self):
        return {100 * k + j for k in self.applied for j in range(2)}

    def crash_point(self):
        return "record_fold"  # the watermark stores' marker


class AnnAdapter(_Adapter):
    REBUCKET_KNOB = False

    def make(self):
        import os

        from propulsion_spark.pipelines.ann_index import AnnIndex

        if os.path.exists(self.path):
            return AnnIndex(self.spark, self.path)
        idx = AnnIndex.build_from(
            self.spark, self._vecs(0), self.path, n_cells=4
        )
        self.applied.add(0)
        return idx

    def _vecs(self, k):
        return self.spark.createDataFrame(
            [
                (100 * k + j, [float(k + 1), float(j + 1), 1.0, 0.5])
                for j in range(2)
            ],
            "vec_id long, embedding array<float>",
        )

    def append(self, store, k):
        store.append(self._vecs(k), batch_id=k)

    def read(self, store):
        return {
            r["vec_id"]
            for r in self.spark.read.parquet(store._vectors_path)
            .select("vec_id")
            .distinct()
            .collect()
        }

    def model(self):
        return {100 * k + j for k in self.applied for j in range(2)}

    def fold(self, store, n_buckets=None):
        store.reindex()

    def crash_point(self):
        return "record_fold"

    def auto(self, store):
        store.auto_compact(max_batches=2)


def _drive(spark, tmp_path, adapter_cls, seed, n_ops):
    from propulsion_spark.pipelines import lineage

    ad = adapter_cls(spark, tmp_path)
    store = ad.make()
    rng = random.Random(seed)
    next_k = [max(ad.applied, default=0) + 1]

    def op_append():
        k = next_k[0]
        next_k[0] += 1
        ad.append(store, k)
        ad.applied.add(k)

    def op_replay():
        ks = [k for k in ad.applied if k >= ad.FIRST_K]
        if not ks:
            return op_append()
        ad.append(store, rng.choice(sorted(ks)))  # model unchanged

    def op_fold():
        if not ad.applied:
            return op_append()
        ad.fold(store)

    def op_crash_fold():
        if not ad.applied:
            return op_append()
        name = ad.crash_point()
        real = getattr(lineage, name)
        setattr(lineage, name, _boom)
        try:
            with pytest.raises(RuntimeError, match="injected"):
                ad.fold(store)
        finally:
            setattr(lineage, name, real)

    def op_auto():
        if not ad.applied:
            return op_append()
        ad.auto(store)

    def op_rebucket():
        if not (ad.REBUCKET_KNOB and ad.applied):
            return op_append()
        ad.fold(store, n_buckets=rng.choice([2, 4, 8]))

    def op_reopen():
        nonlocal store
        store = ad.make()

    ops = [
        (op_append, 4),
        (op_replay, 2),
        (op_fold, 1),
        (op_crash_fold, 1),
        (op_auto, 1),
        (op_rebucket, 1),
        (op_reopen, 1),
    ]
    weighted = [f for f, w in ops for _ in range(w)]
    for i in range(n_ops):
        rng.choice(weighted)()
        got, want = ad.read(store), ad.model()
        assert got == want, f"{adapter_cls.__name__} diverged at op {i}"
    # deterministic tail: injected crash must lose nothing, the redo
    # must fold cleanly, and a REOPENED instance must agree (persisted
    # fan-out routing included)
    op_append()
    op_crash_fold()
    assert ad.read(store) == ad.model(), "crash lost state"
    op_fold()
    assert ad.read(store) == ad.model(), "redo fold diverged"
    store = ad.make()
    assert ad.read(store) == ad.model(), "reopen diverged"
    if ad.REBUCKET_KNOB:
        ad.fold(store, n_buckets=8)
        assert ad.read(store) == ad.model(), "rebucket diverged"
        assert ad.make().n_buckets() == 8  # persisted, not cached


class TestLifecycleConformance:
    @pytest.mark.parametrize("seed", [11, 23])
    def test_gram_registry(self, spark, tmp_path, seed):
        _drive(spark, tmp_path, GramAdapter, seed, n_ops=8)

    @pytest.mark.parametrize("seed", [11, 23])
    def test_source_count_registry(self, spark, tmp_path, seed):
        _drive(spark, tmp_path, SourceCountAdapter, seed, n_ops=8)

    def test_lexical_index(self, spark, tmp_path):
        _drive(spark, tmp_path, LexicalAdapter, seed=7, n_ops=6)

    def test_ann_index(self, spark, tmp_path):
        _drive(spark, tmp_path, AnnAdapter, seed=7, n_ops=5)
