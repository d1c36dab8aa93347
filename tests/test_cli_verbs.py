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
