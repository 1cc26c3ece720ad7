"""SL pipeline: parsers, USI->action geometry, real encoder, shards,
trainer, and the SL -> RL transition."""


import numpy as np
import pytest

from keisei_tpu.sl.dataset import RECORD_SIZE, SLDataset, write_meta, write_shard
from keisei_tpu.sl.encode import GameEncoder, usi_to_action
from keisei_tpu.sl.parsers import (
    CSAParser,
    GameFilter,
    GameOutcome,
    SFENParser,
)
from keisei_tpu.sl.prepare import prepare_sl_data

SFEN_GAME = """\
result:win_black
black_rating:2000
startpos
7g7f
3c3d
8h2b+
3a2b
B*4e

result:draw
startpos
2g2f
8c8d
"""

CSA_GAME = """\
V2.2
N+PlayerBlack
N-PlayerWhite
PI
+
+7776FU
-3334FU
+8822UM
-3122GI
+0045KA
%TORYO
"""


class TestParsers:
    def test_sfen_blocks(self, tmp_path):
        f = tmp_path / "games.sfen"
        f.write_text(SFEN_GAME)
        records = list(SFENParser().parse(f))
        assert len(records) == 2
        assert records[0].outcome == GameOutcome.WIN_BLACK
        assert records[0].metadata["black_rating"] == "2000"
        assert [m.move_usi for m in records[0].moves] == [
            "7g7f", "3c3d", "8h2b+", "3a2b", "B*4e",
        ]
        assert records[1].outcome == GameOutcome.DRAW

    def test_csa_to_usi(self, tmp_path):
        f = tmp_path / "game.csa"
        f.write_text(CSA_GAME)
        records = list(CSAParser().parse(f))
        assert len(records) == 1
        rec = records[0]
        assert [m.move_usi for m in rec.moves] == [
            "7g7f", "3c3d", "8h2b+", "3a2b", "B*4e",
        ]
        # %TORYO after 5 moves: white (to move) resigns... mover count odd ->
        # black just moved -> side to move is white -> white resigns
        assert rec.outcome == GameOutcome.WIN_BLACK

    def test_game_filter(self, tmp_path):
        f = tmp_path / "games.sfen"
        f.write_text(SFEN_GAME)
        records = list(SFENParser().parse(f))
        assert GameFilter(min_ply=3).accepts(records[0])
        assert not GameFilter(min_ply=10).accepts(records[0])
        assert not GameFilter(min_ply=1, min_rating=2500).accepts(records[0])


class TestUSIGeometry:
    def test_exhaustive_roundtrip_against_spectator_decode(self):
        """EVERY spatial action x both colors: decode -> USI -> encode is
        the identity on the on-board set (reference parity: the exhaustive
        encode/decode roundtrips in spatial_action_mapper.rs:356+). The
        on-board count per color is pinned so geometry drift (a ray slot
        silently falling off the board) fails loudly."""
        from keisei_tpu.env.spectator_data import decode_action_np, move_usi

        on_board = {0: 0, 1: 0}
        for stm in (0, 1):
            for action in range(11259):
                is_drop, frm, to, promote, piece = decode_action_np(
                    action, stm)
                if not is_drop and (to < 0 or to > 80 or frm == to):
                    continue  # off-board geometry (ray past the edge)
                on_board[stm] += 1
                usi = move_usi(action, stm)
                assert usi_to_action(usi, stm) == action, (usi, stm)
        # 11,259 = 81 dests x 139 slots; exactly 5,015 survive the board
        # for each color (geometry is color-mirrored, so the counts match)
        assert on_board == {0: 5015, 1: 5015}

    def test_distinct_usi_per_action(self):
        """No two on-board actions of one color may print the same USI —
        otherwise usi_to_action could not be a left inverse and SL replay
        would silently relabel moves."""
        from keisei_tpu.env.spectator_data import decode_action_np, move_usi

        for stm in (0, 1):
            seen: dict[str, int] = {}
            for action in range(11259):
                is_drop, frm, to, promote, piece = decode_action_np(
                    action, stm)
                if not is_drop and (to < 0 or to > 80 or frm == to):
                    continue
                usi = move_usi(action, stm)
                assert usi not in seen, (usi, seen[usi], action, stm)
                seen[usi] = action
            assert len(seen) == 5015


@pytest.mark.integration
class TestEncoder:
    def test_real_encoding_of_known_game(self, tmp_path):
        f = tmp_path / "games.sfen"
        f.write_text(SFEN_GAME)
        records = list(SFENParser().parse(f))
        enc = GameEncoder(batch_games=4)
        obs, pol, val, score, stats = enc.encode_games(records)
        assert stats["positions"] == 7  # 5 + 2 plies, all legal
        assert stats["dropped_moves"] == 0
        # observations are REAL (startpos has 40 piece planes set)
        assert obs[0].sum() > 30
        # value cats alternate with mover for win_black
        assert val[0] == 0 and val[1] == 2 and val[2] == 0
        assert val[5] == 1 and val[6] == 1  # draw game
        # policy targets are the played actions
        assert pol[0] == usi_to_action("7g7f", 0)
        assert pol[1] == usi_to_action("3c3d", 1)
        # score target: startpos material balance is 0
        assert score[0] == 0.0
        # after black captures the bishop (8h2b+), black is up material
        assert score[3] < 0 or score[2] != 0  # white to move sees deficit

    def test_illegal_tail_dropped(self, tmp_path):
        bad = "result:win_black\nstartpos\n7g7f\n7g7f\n"  # second move illegal
        f = tmp_path / "bad.sfen"
        f.write_text(bad)
        records = list(SFENParser().parse(f))
        obs, pol, val, score, stats = GameEncoder(batch_games=2).encode_games(records)
        assert stats["positions"] == 1
        assert stats["dropped_moves"] == 1


@pytest.mark.integration
class TestShardsAndTraining:
    def _prepare(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        (src / "games.sfen").write_text(SFEN_GAME)
        out = tmp_path / "shards"
        summary = prepare_sl_data(
            [str(src)], str(out), min_ply=2, shard_size=5, batch_games=4,
        )
        return out, summary

    def test_prepare_writes_real_shards(self, tmp_path):
        out, summary = self._prepare(tmp_path)
        assert summary["positions"] == 7
        shards = sorted(out.glob("shard_*.bin"))
        assert len(shards) == 2  # 5 + 2 with shard_size=5
        assert shards[0].stat().st_size == 5 * RECORD_SIZE
        ds = SLDataset(str(out))
        assert len(ds) == 7
        rec = ds[0]
        assert rec["observation"].sum() > 30  # real, not placeholder
        assert rec["value_target"] in (0, 1, 2)
        assert not ds.meta["placeholder"]

    def test_placeholder_guard(self, tmp_path):
        out = tmp_path / "ph"
        out.mkdir()
        write_shard(out / "shard_00000.bin",
                    np.zeros((2, 4050), np.float32),
                    np.zeros(2, np.int64), np.zeros(2, np.int64),
                    np.zeros(2, np.float32))
        write_meta(out, [2], placeholder=True)
        with pytest.raises(ValueError, match="placeholder"):
            SLDataset(str(out))

    def test_sl_to_rl_transition(self, tmp_path):
        out, _ = self._prepare(tmp_path)
        from keisei_tpu.training.config import config_from_dict
        from keisei_tpu.training.transition import sl_to_rl

        raw = {
            "model": {"architecture": "mlp", "params": {"hidden_sizes": [16]}},
            "training": {
                "num_games": 2, "max_ply": 16, "steps_per_epoch": 4,
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "algorithm_params": {"batch_size": 8, "epochs_per_batch": 1},
            },
        }
        cfg = config_from_dict(raw)
        rl = sl_to_rl(sl_data_dir=str(out), sl_epochs=2, rl_config=cfg,
                      sl_batch_size=4)
        # warm start: epoch 0, weights loaded from sl_final
        assert rl.epoch == 0
        import jax
        import orbax.checkpoint as ocp

        sl_params = ocp.PyTreeCheckpointer().restore(
            str(tmp_path / "ckpt" / "sl_final")
        )["params"]
        for a, b in zip(jax.tree.leaves(sl_params), jax.tree.leaves(rl.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and it trains
        em = rl.run_epoch()
        assert np.isfinite(em.policy_loss)

    # -- error paths (reference test_sl_to_rl_error_paths.py semantics) -----

    def _rl_cfg(self, tmp_path, params=None, keep=5):
        from keisei_tpu.training.config import config_from_dict

        return config_from_dict({
            "model": {"architecture": "mlp",
                      "params": params or {"hidden_sizes": [16]}},
            "training": {
                "num_games": 2, "max_ply": 16, "steps_per_epoch": 4,
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "checkpoint_keep": keep,
                "algorithm_params": {"batch_size": 8, "epochs_per_batch": 1},
            },
        })

    def test_sl_to_rl_rejects_bad_model_params_before_training(self, tmp_path):
        """Param validation must fire BEFORE the expensive SL run
        (reference transition.py:67-85): with a bogus param, no shard is
        ever opened and no checkpoint dir is created."""
        from keisei_tpu.training.transition import sl_to_rl

        with pytest.raises(ValueError, match="unknown model params"):
            sl_to_rl(
                sl_data_dir=str(tmp_path / "nonexistent"),
                sl_epochs=1,
                rl_config=self._rl_cfg(tmp_path,
                                       params={"hidden_sizes": [16],
                                               "bogus_knob": 3}),
            )
        assert not (tmp_path / "ckpt").exists()

    def test_sl_to_rl_rejects_empty_dataset(self, tmp_path):
        from keisei_tpu.training.transition import sl_to_rl

        empty = tmp_path / "empty"
        empty.mkdir()
        write_meta(empty, [], placeholder=False)
        with pytest.raises(ValueError, match="no SL positions"):
            sl_to_rl(sl_data_dir=str(empty), sl_epochs=1,
                     rl_config=self._rl_cfg(tmp_path))

    def test_sl_checkpoint_never_pruned_by_retention(self, tmp_path):
        """The sl_final warm-start must survive checkpoint retention
        pruning (run.sh --seed relies on the same rule)."""
        out, _ = self._prepare(tmp_path)
        from keisei_tpu.training.transition import sl_to_rl

        cfg = self._rl_cfg(tmp_path, keep=1)
        rl = sl_to_rl(sl_data_dir=str(out), sl_epochs=1, rl_config=cfg,
                      sl_batch_size=4)
        for _ in range(3):
            rl.run_epoch()
            rl.save()
        ckpts = sorted((tmp_path / "ckpt").iterdir())
        assert (tmp_path / "ckpt" / "sl_final") in ckpts
        # retention actually fired: only 1 epoch checkpoint + sl_final remain
        epoch_ckpts = [p for p in ckpts if p.name != "sl_final"]
        assert len(epoch_ckpts) == 1

    def test_sl_to_rl_wins_over_stale_rl_checkpoint(self, tmp_path):
        """A reused checkpoint_dir holding an old RL run (epoch >= 1) must
        not out-rank the just-written SL warm start: auto-discovery prefers
        the highest epoch, so sl_to_rl pins the resume to sl_final
        explicitly (review r2 — previously the SL result was silently
        discarded)."""
        import jax
        import orbax.checkpoint as ocp

        from keisei_tpu.training.loop import SelfPlayTrainer
        from keisei_tpu.training.transition import sl_to_rl

        out, _ = self._prepare(tmp_path)
        cfg = self._rl_cfg(tmp_path)
        # seed the dir with an older RL run that reached epoch 2
        old = SelfPlayTrainer(cfg)
        old.run_epoch()
        old.run_epoch()
        old.save()
        assert old.latest_checkpoint().endswith("epoch_000002")

        rl = sl_to_rl(sl_data_dir=str(out), sl_epochs=1, rl_config=cfg,
                      sl_batch_size=4)
        assert rl.epoch == 0  # warm start, not a resume of the old run
        sl_params = ocp.PyTreeCheckpointer().restore(
            str(tmp_path / "ckpt" / "sl_final")
        )["params"]
        for a, b in zip(jax.tree.leaves(sl_params),
                        jax.tree.leaves(rl.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    def test_sfen_seeded_game_encodes_from_its_position(self, tmp_path):
        """A game starting from a custom SFEN must replay from THAT
        position: its moves are illegal from startpos, so a startpos
        replay would drop every position (regression: the encoder used
        to ignore the position line)."""
        from keisei_tpu.sl.encode import GameEncoder
        from keisei_tpu.sl.parsers import SFENParser

        block = ("result:win_black\n"
                 "4k4/9/9/9/R8/9/9/9/4K4 b - 1\n"
                 "9e9a+\n"   # rook up the open file, promoting — startpos-illegal
                 "5a5b\n")
        f = tmp_path / "seeded.sfen"
        f.write_text(block)
        records = list(SFENParser().parse(f))
        assert len(records) == 1
        assert records[0].start_sfen.startswith("4k4/")
        obs, pol, val, score, stats = GameEncoder().encode_games(records)
        assert stats["positions"] == 2, stats
        assert stats["dropped_moves"] == 0

    def test_csa_time_up_loser_is_side_to_move(self, tmp_path):
        """%TIME_UP records no move for the flagged player: after an even
        number of moves black is on move and loses (regression: was
        inverted to WIN_BLACK)."""
        from keisei_tpu.sl.parsers import CSAParser, GameOutcome

        csa = ("V2.2\nN+B\nN-W\nPI\n+\n"
               "+7776FU\n-3334FU\n%TIME_UP\n")
        f = tmp_path / "t.csa"
        f.write_text(csa)
        rec = list(CSAParser().parse(f))[0]
        assert rec.outcome == GameOutcome.WIN_WHITE


CSA_HANDICAP = """\
V2.2
N+PlayerBlack
N-PlayerWhite
PI82HI22KA
+
+7776FU
-3334FU
%TORYO
"""

CSA_HAND_PIECES = """\
V2.2
N+Black
N-White
P1-KY-KE-GI-KI-OU-KI-GI-KE-KY
P2 * -HI *  *  *  *  * -KA *
P3-FU-FU-FU-FU-FU-FU-FU-FU-FU
P4 *  *  *  *  *  *  *  *  *
P5 *  *  *  *  *  *  *  *  *
P6 *  *  *  *  *  *  *  *  *
P7+FU+FU+FU+FU+FU+FU+FU+FU+FU
P8 * +KA *  *  *  *  * +HI *
P9+KY+KE+GI+KI+OU+KI+GI+KE+KY
P+00FU
+
+7776FU
-3334FU
%TORYO
"""

CSA_EXPLICIT_STANDARD = """\
V2.2
N+Black
N-White
P1-KY-KE-GI-KI-OU-KI-GI-KE-KY
P2 * -HI *  *  *  *  * -KA *
P3-FU-FU-FU-FU-FU-FU-FU-FU-FU
P4 *  *  *  *  *  *  *  *  *
P5 *  *  *  *  *  *  *  *  *
P6 *  *  *  *  *  *  *  *  *
P7+FU+FU+FU+FU+FU+FU+FU+FU+FU
P8 * +KA *  *  *  *  * +HI *
P9+KY+KE+GI+KI+OU+KI+GI+KE+KY
+
+7776FU
-3334FU
%TORYO
"""

CSA_CUSTOM_BOARD = """\
V2.2
N+Black
N-White
P1 *  *  *  *  * -OU *  *  *
P2 *  *  *  *  *  *  *  *  *
P3 *  *  *  *  *  *  *  *  *
P4 *  *  *  *  *  *  *  *  *
P5 *  *  *  *  *  *  *  *  *
P6 *  *  *  *  *  *  *  *  *
P7 *  *  *  *  *  *  *  *  *
P8 *  *  *  *  *  *  *  *  *
P9 *  *  *  * +OU *  *  *  *
+
+5958OU
%TORYO
"""


class TestCSANonStandardStarts:
    """Review r2: the encoder replays CSA games from the standard start
    position — a handicap/custom-position game must be SKIPPED loudly, not
    silently encoded as observations of the wrong board."""

    def _parse(self, tmp_path, text):
        f = tmp_path / "g.csa"
        f.write_text(text)
        return list(CSAParser().parse(f))

    def test_pi_with_removed_pieces_skipped(self, tmp_path):
        assert self._parse(tmp_path, CSA_HANDICAP) == []

    def test_hand_placement_lines_skipped(self, tmp_path):
        assert self._parse(tmp_path, CSA_HAND_PIECES) == []

    def test_custom_board_skipped(self, tmp_path):
        assert self._parse(tmp_path, CSA_CUSTOM_BOARD) == []

    def test_explicit_standard_board_accepted(self, tmp_path):
        recs = self._parse(tmp_path, CSA_EXPLICIT_STANDARD)
        assert len(recs) == 1
        assert [m.move_usi for m in recs[0].moves] == ["7g7f", "3c3d"]

    def test_plain_pi_still_accepted(self, tmp_path):
        assert len(self._parse(tmp_path, CSA_GAME)) == 1

    def test_color_swapped_standard_board_skipped(self, tmp_path):
        """The guard must compare OWNERS, not just piece names/squares: a
        board with the standard layout but inverted color signs is a
        custom position (review r2 — cell[1:3] dropped the +/- sign)."""
        swapped = (CSA_EXPLICIT_STANDARD
                   .replace("-KY-KE-GI-KI-OU-KI-GI-KE-KY",
                            "+KY+KE+GI+KI+OU+KI+GI+KE+KY", 1))
        assert self._parse(tmp_path, swapped) == []


class TestPrepareChannelValidation:
    def test_non_50_channels_rejected_up_front(self, tmp_path):
        from keisei_tpu.sl.prepare import prepare_sl_data
        with pytest.raises(ValueError, match="50 observation channels"):
            prepare_sl_data([str(tmp_path)], str(tmp_path / "out"),
                            num_channels=46)


class TestCSATerminationMarkers:
    """Every CSA termination marker maps to the right outcome (parsers.py
    CSA parity with the reference's CSAParser; the winner conventions are
    subtle: %ILLEGAL_MOVE records the offending move, %TORYO does not)."""

    HEAD = "V2.2\nN+B\nN-W\nPI\n+\n+7776FU\n-3334FU\n"

    @pytest.mark.parametrize("marker,expected", [
        ("%TORYO", "WIN_WHITE"),        # black to move resigns after 2 plies
        ("%TIME_UP", "WIN_WHITE"),
        ("%TSUMI", "WIN_WHITE"),        # black to move is mated
        ("%ILLEGAL_MOVE", "WIN_BLACK"), # last mover (white) played illegal
        ("%KACHI", "WIN_BLACK"),        # declaration win by black, to act
        ("%SENNICHITE", "DRAW"),
        ("%JISHOGI", "DRAW"),
        ("%HIKIWAKE", "DRAW"),
        ("%CHUDAN", "DRAW"),
    ])
    def test_marker_outcome(self, tmp_path, marker, expected):
        from keisei_tpu.sl.parsers import CSAParser, GameOutcome

        f = tmp_path / "m.csa"
        f.write_text(self.HEAD + marker + "\n")
        records = list(CSAParser().parse(f))
        assert len(records) == 1
        assert records[0].outcome == getattr(GameOutcome, expected)

    def test_odd_ply_flips_winner(self, tmp_path):
        from keisei_tpu.sl.parsers import CSAParser, GameOutcome

        f = tmp_path / "m.csa"
        f.write_text("V2.2\nPI\n+\n+7776FU\n%TORYO\n")
        (rec,) = CSAParser().parse(f)
        # after black's single move, WHITE is to move and resigns
        assert rec.outcome == GameOutcome.WIN_BLACK

    def test_rating_comments_extracted(self, tmp_path):
        from keisei_tpu.sl.parsers import CSAParser

        f = tmp_path / "r.csa"
        f.write_text("V2.2\n'black_rate:foo:2345\n'white_rate:bar:1987.5\n"
                     "PI\n+\n+7776FU\n-3334FU\n%TORYO\n")
        (rec,) = CSAParser().parse(f)
        assert rec.metadata["black_rating"] == "2345"
        assert rec.metadata["white_rating"] == "1987"
        from keisei_tpu.sl.parsers import GameFilter

        assert GameFilter(min_ply=1, min_rating=2000).accepts(rec) is False
        assert GameFilter(min_ply=1, min_rating=1900).accepts(rec)


class TestTrainerEval:
    """Held-out evaluation + train-split restriction (evaluate(),
    train_indices, batches(order=...))."""

    @staticmethod
    def _synthetic_dataset(tmp_path, n=96, patterns=8, seed=0):
        """Records whose policy/value targets are a deterministic function
        of the observation (pattern id one-hot in the first plane), so a
        small MLP can memorize them and evaluate() has a known optimum."""
        rng = np.random.default_rng(seed)
        obs = np.zeros((n, 4050), np.float32)
        pol = np.empty(n, np.int64)
        val = np.empty(n, np.int64)
        sc = np.empty(n, np.float32)
        for i in range(n):
            p = i % patterns
            obs[i, p] = 1.0
            obs[i, 100 + p] = 0.5
            pol[i] = 137 * p + 11           # distinct, < 11259
            val[i] = p % 3
            sc[i] = float(p) - 3.5
        order = rng.permutation(n)
        out = tmp_path / "synth"
        out.mkdir()
        write_shard(out / "shard_00000.bin", obs[order], pol[order],
                    val[order], sc[order])
        write_meta(out, [n])
        return SLDataset(str(out))

    def test_batches_explicit_order_yields_exactly_those_records(
            self, tmp_path):
        ds = self._synthetic_dataset(tmp_path, n=16, patterns=16)
        want = np.array([5, 3, 11, 0, 7, 2], np.int64)
        got = []
        for batch in ds.batches(3, order=want, drop_last=True):
            got.extend(batch["policy_target"].tolist())
        assert got == [int(ds[i]["policy_target"]) for i in want]

    def test_batches_requires_rng_or_order(self, tmp_path):
        ds = self._synthetic_dataset(tmp_path, n=8, patterns=8)
        with pytest.raises(ValueError, match="rng"):
            next(ds.batches(4))

    def test_evaluate_and_split_on_memorizable_corpus(self, tmp_path):
        from keisei_tpu.sl.trainer import SLConfig, SLTrainer

        ds = self._synthetic_dataset(tmp_path, n=96, patterns=8)
        train_idx = np.arange(0, 64)
        eval_idx = np.arange(64, 96)
        cfg = SLConfig(learning_rate=3e-3, batch_size=32, epochs=40, seed=1)
        tr = SLTrainer(cfg, "mlp", {"hidden_sizes": [64]}, ds,
                       train_indices=train_idx)

        before = tr.evaluate(eval_idx)
        assert before["positions"] == 32
        assert set(before) == {"positions", "policy_top1", "policy_top5",
                               "policy_nll", "value_acc", "score_mse"}
        # untrained: essentially chance over 11,259 actions
        assert before["policy_top1"] < 0.2
        assert before["policy_nll"] > 2.0

        tr.train()
        after = tr.evaluate(eval_idx)
        # 8 repeated patterns are memorizable; held-out split shares them
        assert after["policy_top1"] == 1.0
        assert after["policy_top5"] >= after["policy_top1"]
        assert after["policy_nll"] < before["policy_nll"]

    def test_evaluate_rejects_subbatch_split(self, tmp_path):
        from keisei_tpu.sl.trainer import SLConfig, SLTrainer

        ds = self._synthetic_dataset(tmp_path, n=16, patterns=8)
        tr = SLTrainer(SLConfig(batch_size=8, epochs=1), "mlp",
                       {"hidden_sizes": [8]}, ds)
        with pytest.raises(ValueError, match="split"):
            tr.evaluate(np.arange(4))
