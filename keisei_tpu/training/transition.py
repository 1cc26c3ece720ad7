"""SL -> RL transition: warm-start the RL loop from supervised weights.

Reference semantics (keisei/training/transition.py:31-180): validate the
SL and RL architectures/params match BEFORE the expensive SL run; train;
save a checkpoint tagged phase="sl"; return a trainer whose resume loads
the weights but discards the SL optimizer/scheduler and starts at epoch 0
(katago_loop.py:725-785). RL warmup entropy then compensates for the
overconfident SL policy.
"""

from __future__ import annotations

import logging
import os

from ..models.registry import validate_model_params
from ..sl.dataset import SLDataset
from ..sl.trainer import SLConfig, SLTrainer
from .config import Config, load_config
from .loop import SelfPlayTrainer

logger = logging.getLogger(__name__)


def sl_to_rl(
    *,
    sl_data_dir: str,
    sl_epochs: int,
    rl_config: Config | str,
    sl_batch_size: int = 4096,
    sl_learning_rate: float = 1e-3,
) -> SelfPlayTrainer:
    """Run SL training, save the checkpoint into the RL checkpoint dir, and
    return an RL trainer resumed from it (optimizer skipped, epoch 0)."""
    config = load_config(rl_config) if isinstance(rl_config, str) else rl_config
    architecture = config.model.architecture
    model_params = dict(config.model.params)
    # fail fast on param problems before the SL run (transition.py:67-85)
    validate_model_params(architecture, model_params)

    dataset = SLDataset(sl_data_dir)
    if len(dataset) == 0:
        raise ValueError(f"no SL positions found under {sl_data_dir}")
    sl_cfg = SLConfig(
        learning_rate=sl_learning_rate, batch_size=sl_batch_size,
        epochs=sl_epochs, seed=config.training.seed,
    )
    trainer = SLTrainer(sl_cfg, architecture, model_params, dataset)
    logger.info("SL training: %d epochs over %d positions", sl_epochs, len(dataset))
    trainer.train()

    ckpt_dir = config.training.checkpoint_dir
    os.makedirs(ckpt_dir, exist_ok=True)
    sl_path = os.path.join(ckpt_dir, "sl_final")
    trainer.save(sl_path)
    logger.info("SL checkpoint saved to %s", sl_path)

    # pin the resume to the just-written SL checkpoint: auto-discovery
    # prefers the highest-epoch checkpoint in the dir, so a reused
    # checkpoint_dir holding an older RL run (epoch >= 1) would silently
    # out-rank sl_final (epoch 0) and discard the SL result (review r2).
    # The trainer sees phase="sl", loads weights only, and starts at epoch 0
    rl = SelfPlayTrainer(config, resume_from=sl_path)
    return rl
