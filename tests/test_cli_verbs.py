"""CLI init/index verb tests (reference tool parity: init, index,
checkpoint, sync — tools/Propulsion.Tool/Program.fs:7-26)."""

from __future__ import annotations

from test_cli import run_cli


class TestInitIndex:
    def test_init_then_sync_then_index_exactly_once(self, tmp_path):
        rep = run_cli("init", "--path", str(tmp_path))
        assert rep["initialized"] == str(tmp_path)
        run_cli(
            "sync",
            "--from", "events:/root/testdata/sf0.001",
            "--to", f"store:{tmp_path}/store",
            "--checkpoints", f"{tmp_path}/checkpoints",
            "--positions", f"{tmp_path}/positions",
        )
        first = run_cli("index", "--store", f"{tmp_path}/store", "--index", f"{tmp_path}/index")
        assert first["verdicts"] == {"appended": 15}
        again = run_cli("index", "--store", f"{tmp_path}/store", "--index", f"{tmp_path}/index")
        assert again["verdicts"] == {"discarded": 15}  # exactly-once


class TestQueryVerbs:
    def test_queries_lists_full_registry(self):
        rep = run_cli("queries")
        # the registry is consolidated to ≤50 so the driver's 50-row
        # correctness gate attests every query (merged reports carry the
        # shapes the dropped names covered)
        assert 45 <= rep["n"] <= 50
        assert "pricing_summary" in rep["queries"]
        assert "asof_join_orders" in rep["queries"]
        assert "priority_reports" in rep["queries"]
        assert "similarity_recall" in rep["queries"]

    def test_query_runs_and_writes_parquet(self, tmp_path):
        import json as _json
        import subprocess
        import sys

        proc = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "query",
             "text_lang_stats", "--limit", "3"],
            capture_output=True, text=True, timeout=240, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        assert 1 <= len(lines) <= 3
        assert "lang" in _json.loads(lines[0])
        rep = run_cli(
            "query", "text_lang_stats", "--out", str(tmp_path / "out")
        )
        assert rep["out"] == str(tmp_path / "out")

    def test_query_unknown_name_errors(self):
        import subprocess
        import sys

        proc = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "query", "nope"],
            capture_output=True, text=True, timeout=120, cwd="/root/repo",
        )
        assert proc.returncode == 2
        assert "unknown query" in proc.stdout


class TestCompactVerb:
    def test_compact_reports_fold(self, tmp_path):
        import json
        import subprocess
        import sys

        store_path = str(tmp_path / "es")
        # build a multi-segment store in-process via the CLI's own sync
        r = subprocess.run(
            [sys.executable, "-c", f"""
import sys; sys.path.insert(0, '/root/repo')
from propulsion_spark import get_spark
from propulsion_spark.streaming.event_store import EventStoreTable
sys.path.insert(0, '/root/repo/tests')
from test_streaming_sinks import envelope_rows, mk_df
spark = get_spark('seed-compact')
store = EventStoreTable(spark, {store_path!r})
for i in range(3):
    store.sync(mk_df(spark, envelope_rows('user-1', i * 2, 2)))
print(max(store.bucket_segment_counts().values()))
"""],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert int(r.stdout.strip().splitlines()[-1]) == 3
        proc = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "compact",
             "--store", store_path, "--max-segments", "1"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rep = json.loads(proc.stdout.strip().splitlines()[-1])
        assert rep["compacted_buckets"]
        assert rep["max_segments_after"] == 1


class TestPackVerb:
    def test_pack_curated_corpus(self, tmp_path):
        import duckdb

        src = str(tmp_path / "docs")
        # write a tiny corpus parquet (doc_id, text, split)
        con = duckdb.connect()
        con.execute(
            f"""COPY (
                 SELECT i AS doc_id,
                        'one two three four five' AS text,
                        CASE WHEN i % 2 = 0 THEN 'train' ELSE 'val' END AS split
                 FROM range(10) t(i)
               ) TO '{src}' (FORMAT PARQUET)"""
        )
        rep = run_cli(
            "pack", "--src", src, "--out", str(tmp_path / "packed"),
            "--seq-len", "8",
        )
        assert rep["seq_len"] == 8
        # 5 docs × 5 tokens per split = 25 tokens → ceil(25/8) = 4 seqs
        for split in ("train", "val"):
            assert rep["splits"][split] == {
                "n_docs": 5,
                "n_tokens": 25,
                "n_seqs": 4,
            }

    def test_pack_with_manifest(self, tmp_path):
        import duckdb

        src = str(tmp_path / "docs")
        duckdb.connect().execute(
            f"""COPY (
                 SELECT i AS doc_id, 'one two three four five' AS text,
                        'train' AS split
                 FROM range(4) t(i)
               ) TO '{src}' (FORMAT PARQUET)"""
        )
        rep = run_cli(
            "pack", "--src", src, "--out", str(tmp_path / "packed"),
            "--seq-len", "8", "--manifest", str(tmp_path / "manifest"),
        )
        assert rep["splits"]["train"]["n_seqs"] == 3  # ceil(20/8)
        con = duckdb.connect()
        rows = con.sql(
            f"SELECT seq_id, n_docs, fill_tokens FROM "
            f"read_parquet('{tmp_path}/manifest/*.parquet') ORDER BY seq_id"
        ).fetchall()
        assert [r[0] for r in rows] == [0, 1, 2]
        assert [r[2] for r in rows] == [8, 8, 4]  # 20 tokens, last partial


class TestAnnVerb:
    def test_build_then_search(self, tmp_path):
        rep = run_cli(
            "ann", "build", "--path", str(tmp_path / "idx"),
            "--sf-dir", "/root/testdata/sf0.001",
        )
        assert rep["codebook"] == "seeded"
        assert rep["n_vectors"] > 0 and rep["n_cells"] > 1
        import json as _json
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "ann", "search",
             "--path", str(tmp_path / "idx"), "--queries", "2"],
            capture_output=True, text=True, check=True,
        ).stdout
        rows = [_json.loads(line) for line in out.splitlines() if line.startswith("{")]
        assert {r["query_id"] for r in rows} == {0, 1}
        assert all(1 <= r["rank"] <= 5 for r in rows)

    def test_stats_and_reindex(self, tmp_path):
        run_cli(
            "ann", "build", "--path", str(tmp_path / "idx2"),
            "--sf-dir", "/root/testdata/sf0.001",
        )
        stats = run_cli("ann", "stats", "--path", str(tmp_path / "idx2"))
        assert stats["n_cells"] > 1 and stats["skew"] >= 1.0
        rep = run_cli("ann", "reindex", "--path", str(tmp_path / "idx2"))
        assert rep["reindexed"].endswith("idx2")
        assert rep["skew_after"] > 0
        # the reindexed index still serves
        import json as _json
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "ann", "search",
             "--path", str(tmp_path / "idx2"), "--queries", "1"],
            capture_output=True, text=True, check=True,
        ).stdout
        rows = [_json.loads(l) for l in out.splitlines() if l.startswith("{")]
        assert rows and all(r["query_id"] == 0 for r in rows)


class TestAnnDeleteVerb:
    def test_delete_masks_then_reindex_compacts(self, tmp_path):
        run_cli(
            "ann", "build", "--path", str(tmp_path / "idx3"),
            "--sf-dir", "/root/testdata/sf0.001",
        )
        # TWO separate default-batch invocations — the r11 lost-delete
        # hazard's natural CLI trigger: the second must accumulate,
        # not overwrite the first's tombstones
        rep = run_cli(
            "ann", "delete", "--path", str(tmp_path / "idx3"),
            "--ids", "20",
        )
        assert rep["deleted"] == 1 and rep["tombstones_live"] == 1
        rep = run_cli(
            "ann", "delete", "--path", str(tmp_path / "idx3"),
            "--ids", "21",
        )
        assert rep == {
            "deleted": 1,
            "tombstones_live": 2,
            "path": str(tmp_path / "idx3"),
        }
        # deleted ids never surface in a search
        import json as _json
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "ann", "search",
             "--path", str(tmp_path / "idx3"), "--queries", "10",
             "--top-k", "50"],
            capture_output=True, text=True, check=True,
        ).stdout
        rows = [_json.loads(l) for l in out.splitlines() if l.startswith("{")]
        assert rows
        assert not {r["neighbor_id"] for r in rows} & {20, 21}
        run_cli("ann", "reindex", "--path", str(tmp_path / "idx3"))
        stats = run_cli("ann", "stats", "--path", str(tmp_path / "idx3"))
        assert stats["n_cells"] > 1  # still serving post-compaction


class TestMediaDedupVerb:
    def test_planted_dupes_reported(self, tmp_path):
        import duckdb  # noqa: F401 — parity with sibling tests
        import numpy as np

        from propulsion_spark import get_spark
        from propulsion_spark.operators.multimodal import encode_bmp
        from propulsion_spark.operators.perceptual import resize_bilinear

        spark = get_spark("mediadedup-fixture")
        rows = []
        for i in range(20):
            rng = np.random.RandomState(i // 2)
            g = resize_bilinear(rng.rand(8, 8) * 235.0, 32, 32)
            if i % 2:
                g = g + 15.0
            g = g.astype(np.uint8).astype(np.float64)
            rows.append(
                (i, bytearray(encode_bmp(np.stack([g, g, g], axis=2))), "image/bmp")
            )
        rows.append((99, bytearray(b"notmedia"), "video/mp4"))
        src = str(tmp_path / "media")
        spark.createDataFrame(
            rows, "doc_id long, media binary, media_type string"
        ).write.parquet(src)

        rep = run_cli(
            "mediadedup", "--src", src, "--out", str(tmp_path / "pairs")
        )
        assert rep["n_media"] == 21
        assert rep["n_fingerprinted"] == 20  # the mp4 degrades to null
        assert rep["n_pairs"] == 10  # exactly the planted even/odd pairs
        got = {
            (r["a_id"], r["b_id"])
            for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
        }
        assert got == {(2 * k, 2 * k + 1) for k in range(10)}


class TestShardVerb:
    def test_shard_writes_partitioned_output(self, tmp_path):
        import duckdb

        src = str(tmp_path / "docs")
        duckdb.connect().execute(
            f"""COPY (
                 SELECT i AS doc_id,
                        'train' AS split,
                        CAST(5 + i % 9 AS BIGINT) AS n_tokens
                 FROM range(200) t(i)
               ) TO '{src}' (FORMAT PARQUET)"""
        )
        rep = run_cli(
            "shard", "--src", src, "--out", str(tmp_path / "sharded"),
            "--shard-tokens", "300",
            "--manifest", str(tmp_path / "man"),
        )
        assert rep["shard_tokens"] == 300
        total = sum(5 + i % 9 for i in range(200))
        assert rep["splits"]["train"]["n_tokens"] == total
        # ~total/300 shards, last partial
        import math
        assert abs(rep["splits"]["train"]["n_shards"] - math.ceil(total / 300)) <= 1
        # physical layout: one directory per (split, shard)
        shards = list((tmp_path / "sharded" / "split=train").glob("shard_id=*"))
        assert len(shards) == rep["splits"]["train"]["n_shards"]
        import duckdb as d2
        man = d2.connect().execute(
            f"SELECT sum(n_tokens) FROM read_parquet('{tmp_path}/man/*.parquet')"
        ).fetchone()
        assert man[0] == total


    def test_shard_jsonl_with_epoch_weights(self, tmp_path):
        """--format jsonl + --epoch-weights: the training-output path —
        epoch resampling ahead of the global shuffle, JSON-lines shard
        files a tokenizer pipeline ingests directly."""
        import duckdb

        src = str(tmp_path / "docs")
        duckdb.connect().execute(
            f"""COPY (
                 SELECT i AS doc_id,
                        'train' AS split,
                        CAST(CASE WHEN i % 2 = 0 THEN 'src0' ELSE 'srcX' END
                             AS VARCHAR) AS source,
                        CAST(10 AS BIGINT) AS n_tokens
                 FROM range(100) t(i)
               ) TO '{src}' (FORMAT PARQUET)"""
        )
        rep = run_cli(
            "shard", "--src", src, "--out", str(tmp_path / "sharded"),
            "--shard-tokens", "200", "--format", "jsonl",
            "--epoch-weights", "src0=20000,default=10000",
        )
        # src0 docs (50) appear exactly twice, srcX (50) once → 150 rows
        assert rep["splits"]["train"]["n_tokens"] == 150 * 10
        files = list(
            (tmp_path / "sharded" / "split=train").glob("shard_id=*/*.json")
        )
        assert files, "jsonl shard files written"
        import json as _json

        rows = [
            _json.loads(line)
            for f in files
            for line in f.read_text().splitlines()
        ]
        assert len(rows) == 150
        # copies carry distinct identities: doc#copy
        ids = sorted(r["doc_id"] for r in rows)
        assert ids.count("0#1") == 1 and ids.count("0#2") == 1
        assert ids.count("1#1") == 1 and "1#2" not in ids

    def test_shard_epoch_weights_quoted_source(self, tmp_path):
        """--epoch-weights with a source name containing a single quote:
        arbitrary user strings must reach the CASE as literals — the
        quoted source doubles, the other source keeps the default."""
        import duckdb

        src = str(tmp_path / "docs")
        duckdb.connect().execute(
            f"""COPY (
                 SELECT i AS doc_id, 'train' AS split,
                        CAST(CASE WHEN i % 2 = 0 THEN 'o''reilly'
                             ELSE 'plain' END AS VARCHAR) AS source,
                        CAST(10 AS BIGINT) AS n_tokens
                 FROM range(100) t(i)
               ) TO '{src}' (FORMAT PARQUET)"""
        )
        rep = run_cli(
            "shard", "--src", src, "--out", str(tmp_path / "sharded"),
            "--shard-tokens", "500", "--format", "jsonl",
            "--epoch-weights", "o'reilly=20000,default=10000",
        )
        # 50 quoted-source docs doubled + 50 plain docs once → 150 rows
        assert rep["splits"]["train"]["n_tokens"] == 150 * 10

    def test_shard_follow_rejects_jsonl(self, tmp_path):
        import subprocess
        import sys

        proc = subprocess.run(
            [
                sys.executable, "-m", "propulsion_spark.cli",
                "shard", "--src", str(tmp_path), "--out",
                str(tmp_path / "o"), "--follow", "--format", "jsonl",
            ],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert proc.returncode == 2

    def test_shard_follow_incremental(self, tmp_path):
        import os

        import duckdb

        src = str(tmp_path / "docs")
        os.makedirs(src, exist_ok=True)
        duckdb.connect().execute(
            f"""COPY (
                 SELECT i AS doc_id, 'train' AS split,
                        CAST(10 AS BIGINT) AS n_tokens
                 FROM range(50) t(i)
               ) TO '{src}/part0.parquet' (FORMAT PARQUET)"""
        )
        rep = run_cli(
            "shard", "--src", src, "--out", str(tmp_path / "inc"),
            "--shard-tokens", "120", "--follow",
        )
        assert rep["splits"]["train"]["n_tokens"] == 500
        # second wave of docs extends the stream, never reshuffles
        duckdb.connect().execute(
            f"""COPY (
                 SELECT 100 + i AS doc_id, 'train' AS split,
                        CAST(10 AS BIGINT) AS n_tokens
                 FROM range(20) t(i)
               ) TO '{src}/part1.parquet' (FORMAT PARQUET)"""
        )
        rep2 = run_cli(
            "shard", "--src", src, "--out", str(tmp_path / "inc"),
            "--shard-tokens", "120", "--follow",
        )
        assert rep2["splits"]["train"]["n_tokens"] == 700
        offs = duckdb.connect().execute(
            f'SELECT "offset", n_tokens FROM read_parquet(\'{tmp_path}/inc/**/*.parquet\') ORDER BY "offset"'
        ).fetchall()
        run = 0
        for off, n in offs:
            assert off == run
            run += n


class TestDecontamVerb:
    def test_decontam_flags_overlap(self, tmp_path):
        import duckdb

        src, bench = str(tmp_path / "docs"), str(tmp_path / "bench")
        con = duckdb.connect()
        con.execute(
            f"""COPY (
                 SELECT i AS doc_id,
                        CASE WHEN i = 7
                             THEN 'the quick brown fox jumps high'
                             ELSE 'clean body text number ' || i END AS text
                 FROM range(20) t(i)
               ) TO '{src}' (FORMAT PARQUET)"""
        )
        con.execute(
            f"""COPY (
                 SELECT 0 AS bid, 'quick brown fox jumps' AS text
               ) TO '{bench}' (FORMAT PARQUET)"""
        )
        rep = run_cli(
            "decontam", "--src", src, "--bench", bench,
            "--out", str(tmp_path / "kept"),
            "--flagged", str(tmp_path / "flagged"),
            "--ngram", "3",
        )
        assert rep["n_docs"] == 20 and rep["n_flagged"] == 1
        assert rep["total_ngram_hits"] == 2  # two 3-gram windows hit
        assert 0 < rep["bloom_fill_ratio"] < 0.01
        kept = duckdb.connect().execute(
            f"SELECT count(*), max(doc_id = 7) FROM read_parquet('{tmp_path}/kept/**/*.parquet')"
        ).fetchone()
        assert kept == (19, False)
        flagged = duckdb.connect().execute(
            f"SELECT doc_id, contaminated_frac > 0 FROM read_parquet('{tmp_path}/flagged/**/*.parquet')"
        ).fetchall()
        assert flagged == [(7, True)]


class TestDeltaVerb:
    def test_describe_checkpoint_read_vacuum(self, tmp_path):
        """delta verb over a table the zorder verb just wrote: the full
        maintenance loop — describe, force-checkpoint, time-travel
        read, vacuum."""
        out = str(tmp_path / "z")
        run_cli(
            "zorder",
            "--src", "/root/testdata/sf0.001/events.parquet",
            "--out", out,
            "--cols", "user_id,value",
            "--num-files", "4",
        )
        desc = run_cli("delta", "describe", "--path", out)
        assert desc["version"] >= 1 and desc["live_files"] >= 1
        assert desc["live_files_with_stats"] == desc["live_files"]
        ck = run_cli("delta", "checkpoint", "--path", out)
        assert ck["checkpointed"] == desc["version"]
        desc2 = run_cli("delta", "describe", "--path", out)
        assert desc2["commits_since_checkpoint"] == 0
        head = run_cli("delta", "read", "--path", out,
                       "--version", str(desc["version"]))
        assert head["rows"] == 1000
        vac = run_cli("delta", "vacuum", "--path", out, "--grace", "3600")
        assert vac["dropped"] == 0  # everything is live and fresh


class TestLexVerb:
    def test_compact_missing_index_json_error(self, tmp_path):
        """r13 (ADVICE r12): maintenance verbs against a never-built
        index follow the JSON-line error contract (rc 2), not a raw
        AnalysisException traceback — for BOTH serving indexes."""
        import subprocess
        import sys

        for verb in (
            ["lex", "compact", "--path", str(tmp_path / "nope")],
            ["ann", "reindex", "--path", str(tmp_path / "nada")],
        ):
            proc = subprocess.run(
                [sys.executable, "-m", "propulsion_spark.cli", *verb],
                capture_output=True, text=True, timeout=180, cwd="/root/repo",
            )
            assert proc.returncode == 2, proc.stderr[-1500:]
            import json as _json

            rep = _json.loads(proc.stdout.strip().splitlines()[-1])
            assert "error" in rep and "missing" in rep["error"]

    def _search(self, path, terms, k=10):
        import json as _json
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "lex", "search",
             "--path", path, "--terms", terms, "--top-k", str(k)],
            capture_output=True, text=True, check=True,
        ).stdout
        return [_json.loads(l) for l in out.splitlines() if l.startswith("{")]

    def test_build_stats_search_delete(self, tmp_path):
        path = str(tmp_path / "lex")
        rep = run_cli(
            "lex", "build", "--path", path,
            "--sf-dir", "/root/testdata/sf0.001",
        )
        assert rep["n_docs"] > 0 and rep["total_tokens"] > rep["n_docs"]
        stats = run_cli("lex", "stats", "--path", path, "--top-k", "5")
        assert stats["n_docs"] == rep["n_docs"]
        assert len(stats["heaviest_tokens"]) == 5
        assert stats["heaviest_tokens"][0]["share"] <= 1.0
        # lifecycle gauges: one build batch, nothing deleted yet
        assert stats["n_batches"] == 1
        assert stats["n_tombstones"] == 0
        rows = self._search(path, "hash,tree")
        assert [r["rank"] for r in rows] == list(range(1, 11))
        victim = rows[0]["doc_id"]
        rep = run_cli("lex", "delete", "--path", path, "--ids", str(victim))
        assert rep["deleted"] == 1
        after = self._search(path, "hash,tree")
        assert victim not in {r["doc_id"] for r in after}
        assert len(after) == 10  # next-ranked docs fill the page
        # a SECOND default-batch delete must keep the first masked
        # (the r11 lost-delete hazard, CLI e2e)
        victim2 = after[0]["doc_id"]
        rep = run_cli("lex", "delete", "--path", path, "--ids", str(victim2))
        assert rep["deleted"] == 1
        final = {r["doc_id"] for r in self._search(path, "hash,tree")}
        assert victim not in final and victim2 not in final
        # empty --ids is rejected, never a zero-row tombstone write
        import subprocess
        import sys

        proc = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "lex", "delete",
             "--path", path, "--ids", ""],
            capture_output=True, text=True, timeout=180, cwd="/root/repo",
        )
        assert proc.returncode == 2
        assert "non-empty" in proc.stdout
        # index still serves after the rejected call
        assert len(self._search(path, "hash,tree")) == 10
        # after two deletes the gauges show the live tombstoned mass…
        mid = run_cli("lex", "stats", "--path", path, "--top-k", "1")
        assert mid["n_tombstones"] == 2
        assert mid["n_batches"] == 1
        # compact folds the tombstones away and stats drop to the live
        # corpus (n_docs - the two deletes)
        rep2 = run_cli("lex", "compact", "--path", path)
        assert rep2["n_docs"] == stats["n_docs"] - 2
        assert rep2["postings_files_after"] <= rep2["postings_files_before"]
        compacted = {r["doc_id"] for r in self._search(path, "hash,tree")}
        assert victim not in compacted and victim2 not in compacted
        assert len(compacted) == 10
        post = run_cli("lex", "stats", "--path", path, "--top-k", "1")
        assert post["n_batches"] == 1 and post["n_tombstones"] == 0
        # --max-df-share: the lever reports its decision first, then
        # the (kept-terms-exact) result rows — nothing saturates at
        # 0.99 on this corpus, so results match the plain search
        out = subprocess.run(
            [sys.executable, "-m", "propulsion_spark.cli", "lex", "search",
             "--path", path, "--terms", "hash,tree", "--top-k", "10",
             "--max-df-share", "0.99"],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        ).stdout
        lines = [
            __import__("json").loads(l)
            for l in out.splitlines() if l.startswith("{")
        ]
        assert lines[0]["dropped_terms"] == {}
        assert lines[0]["kept_terms"] == ["hash", "tree"]
        assert {r["doc_id"] for r in lines[1:]} == compacted
