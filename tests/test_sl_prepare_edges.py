"""SL prepare pipeline edges: file discovery, filtering counters, shard
splitting, parse-error resilience, and the CLI entry.

Reference coverage model: keisei/sl/prepare.py CLI behavior + the
test_sl_prepare* suite (malformed inputs skipped with logs, never fatal).
"""

import json

import pytest

from keisei_tpu.sl.dataset import RECORD_SIZE, SLDataset
from keisei_tpu.sl.parsers import build_parser_registry
from keisei_tpu.sl.prepare import _iter_game_files, main, prepare_sl_data

# 5-ply game that survives min_ply=4 filtering
GAME_5PLY = """\
result:win_black
startpos
7g7f
3c3d
8h2b+
3a2b
B*4e
"""

GAME_2PLY = """\
result:draw
startpos
2g2f
8c8d
"""


@pytest.fixture
def game_dir(tmp_path):
    d = tmp_path / "games"
    d.mkdir()
    (d / "a.sfen").write_text(GAME_5PLY)
    (d / "b.sfen").write_text(GAME_2PLY)
    (d / "ignored.txt").write_text("not a game file")
    return d


class TestIterGameFiles:
    def test_directory_discovers_known_extensions_only(self, game_dir):
        files = _iter_game_files([str(game_dir)], build_parser_registry())
        names = sorted(f.name for f in files)
        assert names == ["a.sfen", "b.sfen"]

    def test_explicit_file_passthrough(self, game_dir):
        files = _iter_game_files([str(game_dir / "a.sfen")],
                                 build_parser_registry())
        assert [f.name for f in files] == ["a.sfen"]

    def test_uppercase_extension_discovered(self, tmp_path):
        d = tmp_path / "up"
        d.mkdir()
        (d / "x.CSA").write_text("V2.2\nPI\n+\n%TORYO\n")
        files = _iter_game_files([str(d)], build_parser_registry())
        assert [f.name for f in files] == ["x.CSA"]

    def test_missing_source_yields_nothing(self, tmp_path):
        files = _iter_game_files([str(tmp_path / "nope")],
                                 build_parser_registry())
        assert files == []


@pytest.mark.integration
class TestPrepareSLData:
    def test_filter_counters(self, game_dir, tmp_path):
        out = tmp_path / "out"
        summary = prepare_sl_data([str(game_dir)], str(out), min_ply=4)
        assert summary["games_parsed"] == 2
        assert summary["games_filtered"] == 1  # the 2-ply draw
        assert summary["parse_errors"] == 0
        assert summary["positions"] == 5
        meta = json.loads((out / "shard_meta.json").read_text())
        assert meta["placeholder"] is False

    def test_shard_splitting(self, game_dir, tmp_path):
        out = tmp_path / "out"
        summary = prepare_sl_data([str(game_dir)], str(out),
                                  min_ply=1, shard_size=3)
        # 5 + 2 = 7 positions at shard_size=3 -> shards of 3,3,1
        assert summary["positions"] == 7
        shards = sorted(out.glob("shard_*.bin"))
        assert len(shards) == 3
        sizes = [s.stat().st_size // RECORD_SIZE for s in shards]
        assert sizes == [3, 3, 1]
        ds = SLDataset(str(out))
        assert len(ds) == 7

    def test_stale_shards_removed(self, game_dir, tmp_path):
        out = tmp_path / "out"
        out.mkdir()
        stale = out / "shard_99999.bin"
        stale.write_bytes(b"\0" * RECORD_SIZE)
        prepare_sl_data([str(game_dir)], str(out), min_ply=1)
        assert not stale.exists()

    def test_unparseable_file_counted_not_fatal(self, game_dir, tmp_path):
        # a .csa file with garbage content: parse error logged, run continues
        (game_dir / "bad.csa").write_bytes(b"\xff\xfe garbage \x00")
        out = tmp_path / "out"
        summary = prepare_sl_data([str(game_dir)], str(out), min_ply=4)
        assert summary["positions"] == 5  # good games still encoded

    def test_empty_sources_writes_empty_meta(self, tmp_path):
        out = tmp_path / "out"
        summary = prepare_sl_data([str(tmp_path / "none")], str(out))
        assert summary["positions"] == 0
        meta = json.loads((out / "shard_meta.json").read_text())
        assert meta["num_shards"] == 0 and meta["shard_counts"] == []
        assert meta["total_positions"] == 0

    def test_cli_main(self, game_dir, tmp_path):
        out = tmp_path / "cli_out"
        main([str(game_dir), "--output-dir", str(out), "--min-ply", "4"])
        assert (out / "shard_meta.json").exists()
        ds = SLDataset(str(out))
        assert len(ds) == 5
