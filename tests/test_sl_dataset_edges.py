"""SL shard dataset: corruption, validation, mmap-cache, batching edges.

The reference hardens its mmap dataset against truncated shards, corrupt
target domains, and fork-unsafe maps (keisei/sl/dataset.py:72-208, mirrored
here at keisei_tpu/sl/dataset.py). These tests drive every guard.
"""

import json

import numpy as np
import pytest

from keisei_tpu.sl.dataset import (
    OBS_SIZE,
    RECORD_SIZE,
    SLDataset,
    write_meta,
    write_shard,
)


def make_shard(path, n, policy_base=0):
    obs = np.random.default_rng(n).normal(size=(n, OBS_SIZE)).astype(np.float32)
    write_shard(path, obs,
                policy_targets=np.arange(n) + policy_base,
                value_targets=np.arange(n) % 3,
                score_targets=np.linspace(-1, 1, n, dtype=np.float32))
    return obs


@pytest.fixture
def data_dir(tmp_path):
    d = tmp_path / "sl"
    d.mkdir()
    make_shard(d / "shard_000.bin", 5)
    make_shard(d / "shard_001.bin", 3, policy_base=100)
    write_meta(d, [5, 3])
    return d


class TestIndexing:
    def test_cross_shard_indexing(self, data_dir):
        ds = SLDataset(str(data_dir))
        assert len(ds) == 8
        assert ds[0]["policy_target"] == 0
        assert ds[4]["policy_target"] == 4
        assert ds[5]["policy_target"] == 100  # first record of shard 1
        assert ds[7]["policy_target"] == 102

    def test_out_of_range(self, data_dir):
        ds = SLDataset(str(data_dir))
        with pytest.raises(IndexError):
            ds[8]
        with pytest.raises(IndexError):
            ds[-1]

    def test_score_and_value_roundtrip(self, data_dir):
        ds = SLDataset(str(data_dir))
        rec = ds[1]
        assert rec["value_target"] == 1
        assert rec["observation"].shape == (OBS_SIZE,)
        assert np.isfinite(rec["score_target"])


class TestCorruption:
    def test_truncated_shard_drops_partial_record(self, tmp_path, caplog):
        d = tmp_path / "sl"
        d.mkdir()
        make_shard(d / "shard_000.bin", 4)
        # chop half a record off the end
        p = d / "shard_000.bin"
        p.write_bytes(p.read_bytes()[: 4 * RECORD_SIZE - RECORD_SIZE // 2])
        write_meta(d, [4])
        import logging
        with caplog.at_level(logging.WARNING):
            ds = SLDataset(str(d))
        assert len(ds) == 3  # partial tail truncated
        assert any("not a multiple" in r.message for r in caplog.records)
        assert ds[2]["policy_target"] == 2

    def test_corrupt_policy_rejected(self, tmp_path):
        d = tmp_path / "sl"
        d.mkdir()
        make_shard(d / "shard_000.bin", 2)
        write_meta(d, [2])
        # overwrite record 1's policy with an out-of-domain id
        buf = np.memmap(d / "shard_000.bin", dtype=np.uint8, mode="r+")
        off = RECORD_SIZE + OBS_SIZE * 4
        buf[off: off + 8] = np.frombuffer(np.int64(99999).tobytes(), np.uint8)
        buf.flush()
        del buf
        ds = SLDataset(str(d))
        assert ds[0]["policy_target"] == 0  # intact record still reads
        with pytest.raises(ValueError, match="invalid policy_target"):
            ds[1]

    def test_corrupt_value_rejected_in_batches(self, tmp_path):
        d = tmp_path / "sl"
        d.mkdir()
        make_shard(d / "shard_000.bin", 4)
        write_meta(d, [4])
        buf = np.memmap(d / "shard_000.bin", dtype=np.uint8, mode="r+")
        off = OBS_SIZE * 4 + 8  # value field of record 0
        buf[off: off + 8] = np.frombuffer(np.int64(7).tobytes(), np.uint8)
        buf.flush()
        del buf
        ds = SLDataset(str(d))
        with pytest.raises(ValueError, match="invalid value target"):
            list(ds.batches(4, np.random.default_rng(0)))

    def test_placeholder_guard_and_override(self, tmp_path):
        d = tmp_path / "sl"
        d.mkdir()
        make_shard(d / "shard_000.bin", 2)
        write_meta(d, [2], placeholder=True)
        with pytest.raises(ValueError, match="placeholder"):
            SLDataset(str(d))
        ds = SLDataset(str(d), allow_placeholder=True)
        assert len(ds) == 2

    def test_missing_meta_tolerated(self, tmp_path):
        d = tmp_path / "sl"
        d.mkdir()
        make_shard(d / "shard_000.bin", 2)
        ds = SLDataset(str(d))  # no shard_meta.json
        assert len(ds) == 2 and ds.meta == {}


class TestMmapCache:
    def test_lru_eviction(self, tmp_path):
        d = tmp_path / "sl"
        d.mkdir()
        for i in range(4):
            make_shard(d / f"shard_{i:03d}.bin", 2)
        write_meta(d, [2] * 4)
        ds = SLDataset(str(d), mmap_cache_size=2)
        for i in range(8):
            ds[i]
        assert len(ds._cache) == 2
        assert set(ds._cache) == {2, 3}  # most recent shards
        ds[0]  # touch shard 0 -> evicts oldest (2)
        assert set(ds._cache) == {3, 0}


class TestBatches:
    def test_epoch_covers_everything_once(self, data_dir):
        ds = SLDataset(str(data_dir))
        seen = []
        for b in ds.batches(3, np.random.default_rng(1), drop_last=False):
            seen.extend(b["policy_target"].tolist())
        assert sorted(seen) == [0, 1, 2, 3, 4, 100, 101, 102]

    def test_drop_last(self, data_dir):
        ds = SLDataset(str(data_dir))
        batches = list(ds.batches(3, np.random.default_rng(1)))
        assert [len(b["policy_target"]) for b in batches] == [3, 3]

    def test_shuffle_positions_match_targets(self, data_dir):
        """The shard-grouped read optimization must not scramble the
        (observation, target) pairing."""
        ds = SLDataset(str(data_dir))
        expect = {ds[i]["policy_target"]: ds[i]["observation"][0]
                  for i in range(len(ds))}
        for b in ds.batches(4, np.random.default_rng(7), drop_last=False):
            for k in range(len(b["policy_target"])):
                assert b["observation"][k, 0] == expect[int(b["policy_target"][k])]

    def test_meta_written_atomically(self, tmp_path):
        d = tmp_path / "sl"
        d.mkdir()
        write_meta(d, [1, 2], extra={"encoder": "real"})
        m = json.loads((d / "shard_meta.json").read_text())
        assert m["total_positions"] == 3
        assert m["record_size"] == RECORD_SIZE
        assert m["encoder"] == "real"
        assert not (d / "shard_meta.json.tmp").exists()
