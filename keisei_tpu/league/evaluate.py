"""Head-to-head evaluation CLI: checkpoint A vs checkpoint B on TPU.

`keisei-tpu-evaluate --a <ckpt> --b <ckpt> --games N` plays batched games
and reports win rate, Elo delta, and a Wilson 95% confidence interval
(reference: keisei/training/evaluate.py:22-76).
"""

from __future__ import annotations

import argparse
import json
import logging
import math
from dataclasses import asdict, dataclass


from ..models.registry import build_model
from ..training.checkpoint import load_meta
from .match import MatchResult, play_match

logger = logging.getLogger(__name__)


@dataclass
class EvalResult:
    games: int
    wins_a: int
    wins_b: int
    draws: int
    win_rate_a: float  # draws count 0.5 (evaluate.py:36-41)
    elo_delta: float
    wilson_low: float
    wilson_high: float

    @classmethod
    def from_match(cls, m: MatchResult) -> EvalResult:
        return cls.from_counts(m.wins_a, m.wins_b, m.draws, m.games)

    @classmethod
    def from_counts(cls, wins_a: int, wins_b: int, draws: int,
                    games: int) -> EvalResult:
        """Aggregate W/L/D counts (e.g. summed over repeated matches) into
        a scored result; draws count 0.5 (evaluate.py:36-41)."""
        wr = (wins_a + 0.5 * draws) / max(games, 1)
        return cls(
            games=games, wins_a=wins_a, wins_b=wins_b, draws=draws,
            win_rate_a=wr, elo_delta=elo_delta(wr),
            wilson_low=wilson_interval(wr, games)[0],
            wilson_high=wilson_interval(wr, games)[1],
        )


def elo_delta(win_rate: float) -> float:
    """-400 * log10(1/wr - 1), clamped away from 0/1 (evaluate.py:43-49)."""
    wr = min(max(win_rate, 1e-3), 1 - 1e-3)
    return -400.0 * math.log10(1.0 / wr - 1.0)


def wilson_interval(p: float, n: int, z: float = 1.96) -> tuple[float, float]:
    """Wilson score interval for a binomial proportion (evaluate.py:51-57)."""
    if n == 0:
        return 0.0, 1.0
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return max(0.0, center - half), min(1.0, center + half)


def _load_model_and_vars(path: str):
    """Build the model recorded in a checkpoint's metadata and restore its
    variables (params + batch_stats)."""
    import orbax.checkpoint as ocp

    from .store import OpponentStore

    meta = load_meta(path)
    arch = meta["architecture"]
    model_params = meta.get("model_params", {})
    model, _ = build_model(arch, model_params)
    # topology-free numpy restore (no sharding-sidecar warning; evaluation
    # must read checkpoints written under any device mesh)
    restored = OpponentStore._restore_raw(ocp.PyTreeCheckpointer(), path)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    return model, variables, meta


def run_evaluation(
    ckpt_a: str,
    ckpt_b: str,
    *,
    games: int = 64,
    max_ply: int = 512,
    temperature: float = 1.0,
    seed: int = 0,
) -> EvalResult:
    model_a, vars_a, meta_a = _load_model_and_vars(ckpt_a)
    model_b, vars_b, meta_b = _load_model_and_vars(ckpt_b)
    logger.info(
        "evaluating %s (epoch %s) vs %s (epoch %s), %d games",
        ckpt_a, meta_a.get("epoch"), ckpt_b, meta_b.get("epoch"), games,
    )
    m = play_match(
        model_a, vars_a, model_b, vars_b,
        num_games=games, max_ply=max_ply, temperature=temperature, seed=seed,
    )
    return EvalResult.from_match(m)


def main(argv=None):
    p = argparse.ArgumentParser(description="keisei-tpu head-to-head evaluation")
    p.add_argument("--a", required=True, help="checkpoint dir for player A")
    p.add_argument("--b", required=True, help="checkpoint dir for player B")
    p.add_argument("--games", type=int, default=64)
    p.add_argument("--max-ply", type=int, default=512)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    result = run_evaluation(
        args.a, args.b, games=args.games, max_ply=args.max_ply,
        temperature=args.temperature, seed=args.seed,
    )
    print(json.dumps(asdict(result), indent=1))


if __name__ == "__main__":
    main()
