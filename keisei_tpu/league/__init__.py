"""Opponent league: snapshot store, match play, evaluation, tiers, tournaments."""

from .evaluate import EvalResult, elo_delta, run_evaluation, wilson_interval
from .match import MatchResult, make_match_runner, play_match
from .store import (
    EntryStatus,
    OpponentEntry,
    OpponentStore,
    Role,
    compute_elo_update,
)

__all__ = [
    "OpponentStore", "OpponentEntry", "Role", "EntryStatus",
    "compute_elo_update", "play_match", "make_match_runner", "MatchResult",
    "run_evaluation", "EvalResult", "elo_delta", "wilson_interval",
]
