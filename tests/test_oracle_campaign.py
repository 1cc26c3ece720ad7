"""Rare-rule oracle-vs-JAX equivalence scenarios, in-suite tier.

The full campaign (>=1,000 max-ply-512 playouts, every scenario variant)
runs via scripts/oracle_campaign.py with its census committed under
profiles/oracle-campaign.json (VERDICT r2 #2). This file keeps a
representative slice in the default suite so a regression in any rare rule
fails CI directly, plus the full scripted scenario grid under -m slow.

Every drive asserts full legal-mask + hash + termination/winner equality
between the scalar oracle and the jitted engine at every ply (the
reference's per-rule batteries: rules.rs:19-162, :228-397).
"""

import numpy as np
import pytest

from keisei_tpu.engine import equiv as E
from keisei_tpu.engine import types as TY


@pytest.fixture(scope="module")
def stepper64():
    return E.make_stepper(64)


@pytest.fixture(scope="module")
def stepper6():
    return E.make_stepper(6)


def _drive(sc, stepper, max_ply=64, census=None):
    census = census if census is not None else E.Census()
    E.drive_equivalence(
        sc["board"], sc["hands"], sc["stm"], sc.get("max_ply", max_ply),
        sc["policy"], census, stepper=stepper,
        expected_reason=sc["expected_reason"],
        expected_winner=sc["expected_winner"], name=sc["name"],
    )
    return census


class TestPerpetualCheck:
    def test_rook_shuttle_victim_wins(self, stepper64):
        c = _drive(E.perpetual_scenario(3, TY.ROOK, False), stepper64)
        assert c.perpetual_check_wins == 1

    def test_dragon_flipped(self, stepper64):
        c = _drive(E.perpetual_scenario(4, TY.ROOK + 8, True), stepper64)
        assert c.perpetual_check_wins == 1


class TestSennichite:
    def test_quiet_gold_shuttle_draws(self, stepper64):
        c = _drive(E.sennichite_scenario(1, 5, TY.GOLD, False), stepper64)
        assert c.repetition_draws == 1

    def test_tokin_flipped(self, stepper64):
        c = _drive(E.sennichite_scenario(2, 6, TY.PAWN + 8, True), stepper64)
        assert c.repetition_draws == 1


class TestImpasse:
    @pytest.mark.parametrize("b,w,reason", [
        (24, 23, TY.IMPASSE), (23, 24, TY.IMPASSE), (24, 24, TY.IMPASSE),
        (23, 23, TY.MAX_MOVES),  # one point short: must NOT fire
    ])
    def test_csa24_boundaries(self, stepper6, b, w, reason):
        sc = E.impasse_scenario(1, b, w)
        assert sc["expected_reason"] == reason
        _drive(sc, stepper6)


class TestUchifuzume:
    def test_mate_excluded_and_near_misses_legal(self):
        census = E.Census()
        for broken in (None, "edge_cover", "protection"):
            b, h, s, a, exc = E.uchifuzume_fixture(4, "knight", False, broken)
            E.check_uchifuzume_fixture(b, h, s, a, exc, census,
                                       name=f"knight,{broken}")
        assert census.uchifuzume_exclusions == 1

    def test_flipped_psilver_variant(self):
        census = E.Census()
        b, h, s, a, exc = E.uchifuzume_fixture(3, "psilver", True)
        E.check_uchifuzume_fixture(b, h, s, a, exc, census, name="psilver-fl")
        assert exc and census.uchifuzume_exclusions >= 1


class TestBiasedRandomPlayouts:
    def test_handicap_and_drop_heavy(self, stepper64):
        census = E.Census()
        rng = np.random.default_rng(7)
        board = E.handicap_board(E.HANDICAPS["two_piece"])
        E.drive_equivalence(board, None, 0, 64, E.random_policy, census,
                            stepper=stepper64, rng=rng, name="handicap")
        db, dh = E.drop_heavy_position()
        E.drive_equivalence(db, dh, 0, 64, E.random_policy, census,
                            stepper=stepper64, rng=rng, name="drop-heavy")
        assert census.playouts == 2 and census.plies > 0


@pytest.mark.slow
class TestFullScenarioGrid:
    """The complete scripted grid (the campaign's scenario half): ~500
    scenarios, every variant of every rare rule, zero divergence."""

    def test_all_groups(self):
        import scripts.oracle_campaign as oc

        total = E.Census()
        for group in ("perpetual", "sennichite", "impasse", "uchifuzume"):
            res = oc.run_scenario_chunk(group)
            assert not res["failures"], res["failures"][0]
            c = E.Census()
            for k, v in res["census"].items():
                setattr(c, k, v)
            total.add(c)
        assert total.perpetual_check_wins >= 50
        assert total.repetition_draws >= 50
        assert total.impasse_wins >= 50
        assert total.uchifuzume_exclusions >= 50
