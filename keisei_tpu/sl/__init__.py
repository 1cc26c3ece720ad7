"""Supervised-learning pipeline: parsers, real batched encoder, shards, trainer."""

from .dataset import SCORE_NORMALIZATION, SLDataset, write_meta, write_shard
from .encode import GameEncoder, usi_to_action
from .parsers import (
    CSAParser,
    GameFilter,
    GameOutcome,
    GameParser,
    GameRecord,
    ParsedMove,
    SFENParser,
    build_parser_registry,
)
from .prepare import prepare_sl_data
from .trainer import SLConfig, SLTrainer
