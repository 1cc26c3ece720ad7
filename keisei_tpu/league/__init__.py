"""Opponent league: snapshot store, match play, evaluation, tiers, tournaments."""

from .config import LeagueConfig, league_config_from_dict
from .evaluate import EvalResult, elo_delta, run_evaluation, wilson_interval
from .match import MatchResult, make_match_runner, play_match
from .scheduler import MatchScheduler, PriorityScorer, classify_match, is_training_match
from .store import (
    EntryStatus,
    OpponentEntry,
    OpponentStore,
    Role,
    compute_elo_update,
)
from .tiers import DynamicManager, FrontierManager, RecentFixedManager, TieredPool

__all__ = [
    "OpponentStore", "OpponentEntry", "Role", "EntryStatus",
    "compute_elo_update", "play_match", "make_match_runner", "MatchResult",
    "run_evaluation", "EvalResult", "elo_delta", "wilson_interval",
    "LeagueConfig", "league_config_from_dict", "TieredPool",
    "FrontierManager", "RecentFixedManager", "DynamicManager",
    "MatchScheduler", "PriorityScorer", "classify_match", "is_training_match",
]
