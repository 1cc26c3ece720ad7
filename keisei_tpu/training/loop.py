"""Self-play training loop: fused rollout -> PPO update per epoch.

The TPU-native counterpart of the reference's KataGoTrainingLoop
(keisei/training/katago_loop.py:454-1953), no-league path: per epoch one
jitted rollout scan (T steps x N envs, zero host transfer) and one jitted
update program, plus host-side orchestration — entropy schedule, plateau
LR, periodic checkpoints, episode statistics, and a pluggable metrics sink
(the SQLite observability DB plugs in here).

Multi-chip: the env batch is sharded over a 1-D data mesh; parameters are
replicated; XLA inserts the gradient psums and computes global BatchNorm
statistics (replacing DDP + SyncBatchNorm, katago_loop.py:491-508).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..env.vec_env import EnvCore
from ..models.registry import build_model, get_model_contract
from ..parallel.mesh import make_mesh, replicate, shard_env_batch
from .checkpoint import load_checkpoint, load_meta, save_checkpoint
from .config import Config
from .ppo import (
    TrainState,
    entropy_coeff_schedule,
    get_learning_rate,
    make_optimizer,
    make_ppo_update,
    set_learning_rate,
)
from .observability import TrainingObserver
from .rollout import make_selfplay_rollout
from .value_adapter import get_value_adapter

logger = logging.getLogger(__name__)


@dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (mode=min), matching torch semantics used by the
    reference (katago_loop.py:434-451, monitor = policy_loss)."""

    factor: float = 0.5
    patience: int = 50
    min_lr: float = 1e-5
    best: float = float("inf")
    bad_epochs: int = 0

    def step(self, value: float, current_lr: float) -> float:
        if value < self.best:
            self.best = value
            self.bad_epochs = 0
            return current_lr
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr


@dataclass
class EpochMetrics:
    epoch: int
    policy_loss: float
    value_loss: float
    score_loss: float
    entropy: float
    gradient_norm: float
    learning_rate: float
    episodes: int
    wins_black: int
    wins_white: int
    draws: int
    truncated: int
    mean_episode_length: float
    rollout_time: float
    update_time: float

    def as_dict(self) -> dict:
        return dict(self.__dict__)


class SelfPlayTrainer:
    """No-league self-play trainer (league multiplexing lands separately)."""

    def __init__(self, config: Config, metrics_sink=None, observer=None):
        self.config = config
        self.metrics_sink = metrics_sink or (lambda m: None)
        self.observer = observer or TrainingObserver(config.display.db_path)
        tc = config.training

        self.num_channels = 46 if tc.observation_mode == "default" else 50
        if config.model.params.get("obs_channels", 50) != self.num_channels:
            raise ValueError(
                f"model obs_channels {config.model.params.get('obs_channels')} "
                f"!= env channels {self.num_channels} for observation_mode "
                f"{tc.observation_mode!r} (fail-fast, katago_loop.py:575-598)"
            )

        # num_devices: 0 = single device (default; never let the visible
        # device count break a single-host config), -1 = all visible, N = N.
        n_dev = config.distributed.num_devices
        if n_dev == -1:
            n_dev = len(jax.devices())
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        if n_dev > 1 and tc.num_games % n_dev != 0:
            raise ValueError(
                f"num_games {tc.num_games} must divide evenly over {n_dev} devices"
            )

        self.env_core = EnvCore(tc.num_games, tc.max_ply, self.num_channels)
        self.model, self.model_cfg = build_model(
            config.model.architecture, config.model.params
        )
        contract = get_model_contract(config.model.architecture)
        ap = config.algorithm_params
        if contract == "katago":
            self.adapter = get_value_adapter(
                "katago",
                lambda_value=ap.lambda_value,
                lambda_score=ap.lambda_score,
                score_blend_alpha=ap.score_blend_alpha,
            )
        else:
            self.adapter = get_value_adapter("scalar")

        self.optimizer = make_optimizer(ap)
        self.T = tc.effective_steps_per_epoch
        self._rollout = jax.jit(
            make_selfplay_rollout(self.env_core, self.model, self.adapter, self.T)
        )
        self._update = jax.jit(
            make_ppo_update(self.model, self.adapter, ap, self.optimizer)
        )
        self.lr_sched = PlateauScheduler(
            factor=tc.lr_plateau_factor,
            patience=tc.lr_plateau_patience,
            min_lr=tc.lr_min,
        )

        self.rng = jax.random.key(tc.seed)
        self.epoch = 0
        self._init_state()
        self._maybe_resume()

        # episode aggregates
        self.total_episodes = 0
        self.total_ply = 0

    # -- state management ------------------------------------------------------

    def _variables(self):
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v

    def _init_state(self):
        self.rng, k = jax.random.split(self.rng)
        dummy = jnp.zeros((2, self.num_channels, 9, 9), jnp.float32)
        variables = self.model.init(k, dummy, train=False)
        params = variables["params"]
        self.state = TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(params),
            step=jnp.int32(0),
        )
        env_states, obs, mask = self.env_core.init()
        if self.mesh is not None:
            env_states = shard_env_batch(self.mesh, env_states)
            obs = shard_env_batch(self.mesh, obs)
            mask = shard_env_batch(self.mesh, mask)
            self.state = replicate(self.mesh, self.state)
        self.env_carry = (env_states, obs, mask)

    def latest_checkpoint(self) -> str | None:
        d = self.config.training.checkpoint_dir
        if not os.path.isdir(d):
            return None
        best, best_epoch = None, -1
        for name in os.listdir(d):
            p = os.path.join(d, name)
            if os.path.isfile(os.path.join(p, "keisei_meta.json")):
                ep = load_meta(p).get("epoch", -1)
                if ep > best_epoch:
                    best, best_epoch = p, ep
        return best

    def _maybe_resume(self):
        path = self.latest_checkpoint()
        if path is None:
            return
        self.state, meta, self.rng = load_checkpoint(
            path, self.state, architecture=self.config.model.architecture
        )
        self.epoch = meta["epoch"]
        lr = meta.get("learning_rate")
        if lr:
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, lr)
            )
        logger.info("resumed from %s at epoch %d", path, self.epoch)

    def save(self, path: str | None = None) -> str:
        d = self.config.training.checkpoint_dir
        os.makedirs(d, exist_ok=True)
        path = path or os.path.join(d, f"epoch_{self.epoch:06d}")
        save_checkpoint(
            path,
            self.state,
            epoch=self.epoch,
            architecture=self.config.model.architecture,
            rng_key=self.rng,
            extra_meta={
                "learning_rate": get_learning_rate(self.state.opt_state),
                "model_params": dict(self.config.model.params),
            },
        )
        return path

    # -- training ---------------------------------------------------------------

    def run_epoch(self) -> EpochMetrics:
        tc = self.config.training
        self.rng, k_roll, k_upd = jax.random.split(self.rng, 3)

        t0 = time.monotonic()
        self.observer.heartbeat(self.epoch, self.epoch * self.T, "rollout")
        carry, traj, next_value, stats = self._rollout(
            self._variables(), *self.env_carry, k_roll
        )
        env_states, obs, mask, _ = carry
        self.env_carry = (env_states, obs, mask)
        stats = jax.tree.map(int, jax.device_get(stats))
        t1 = time.monotonic()

        self.observer.heartbeat(self.epoch, self.epoch * self.T, "update")
        entropy_coeff = entropy_coeff_schedule(
            self.config.algorithm_params, self.epoch,
            tc.entropy_warmup_epochs, tc.entropy_warmup_coeff,
        )
        self.state, metrics = self._update(
            self.state, traj, next_value, k_upd, entropy_coeff
        )
        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        t2 = time.monotonic()

        lr = get_learning_rate(self.state.opt_state)
        new_lr = self.lr_sched.step(metrics["policy_loss"], lr)
        if new_lr != lr:
            logger.info("LR reduced: %.6f -> %.6f (monitor=policy_loss)", lr, new_lr)
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, new_lr)
            )

        self.epoch += 1
        self.total_episodes += stats.episodes
        self.total_ply += stats.total_ply
        em = EpochMetrics(
            epoch=self.epoch,
            policy_loss=metrics["policy_loss"],
            value_loss=metrics["value_loss"],
            score_loss=metrics["score_loss"],
            entropy=metrics["entropy"],
            gradient_norm=metrics["gradient_norm"],
            learning_rate=new_lr,
            episodes=stats.episodes,
            wins_black=stats.wins_black,
            wins_white=stats.wins_white,
            draws=stats.draws,
            truncated=stats.truncated,
            mean_episode_length=(
                stats.total_ply / stats.episodes if stats.episodes else 0.0
            ),
            rollout_time=t1 - t0,
            update_time=t2 - t1,
        )
        self.metrics_sink(em.as_dict())
        ckpt = None
        if self.epoch % tc.checkpoint_interval == 0:
            ckpt = self.save()
        self.observer.on_epoch(em.as_dict(), self.epoch * self.T, ckpt)
        self.observer.snapshot_envs(env_states)
        return em

    def run(self, num_epochs: int | None = None):
        n = num_epochs or self.config.run.default_epochs
        target = self.epoch + n
        self.observer.on_start(self.config, total_epochs=target)
        while self.epoch < target:
            em = self.run_epoch()
            steps = self.T * self.config.training.num_games
            sps = steps / max(em.rollout_time, 1e-9)
            logger.info(
                "epoch %d: policy=%.4f value=%.4f entropy=%.3f eps=%d "
                "(B%d/W%d/D%d) rollout=%.2fs (%.0f steps/s) update=%.2fs",
                em.epoch, em.policy_loss, em.value_loss, em.entropy,
                em.episodes, em.wins_black, em.wins_white, em.draws,
                em.rollout_time, sps, em.update_time,
            )
        self.save()
        self.observer.on_stop("stopped")


def main(argv=None):
    import argparse

    from .config import load_config

    parser = argparse.ArgumentParser(description="keisei-tpu self-play training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        force=True,  # the TPU platform plugin pre-configures logging at import
    )
    config = load_config(args.config)
    if args.seed is not None:
        import dataclasses

        config = dataclasses.replace(
            config, training=dataclasses.replace(config.training, seed=args.seed)
        )
    trainer = SelfPlayTrainer(config)
    trainer.run(args.epochs)


if __name__ == "__main__":
    main()
