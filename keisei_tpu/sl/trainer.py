"""Supervised-learning trainer: CE(policy) + 1.5*CE(WDL) + 0.02*MSE(score).

Reference parity (keisei/sl/trainer.py:73-191): Adam + cosine LR + grad
clip; bf16 model compute replaces AMP/GradScaler. The train step is one
jitted program; batches stream from the mmap dataset.

The final checkpoint is written with training/checkpoint.py so the RL loop
resumes from it directly (SL -> RL transition skips the optimizer).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.registry import build_model, get_model_contract
from ..training.checkpoint import save_checkpoint
from ..training.ppo import TrainState
from .dataset import SLDataset

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class SLConfig:
    learning_rate: float = 1e-3
    batch_size: int = 256
    epochs: int = 10
    lambda_policy: float = 1.0
    lambda_value: float = 1.5
    lambda_score: float = 0.02
    grad_clip: float = 1.0
    min_lr_fraction: float = 0.01
    seed: int = 0


class SLTrainer:
    def __init__(self, config: SLConfig, architecture: str, model_params: dict,
                 dataset: SLDataset,
                 train_indices: np.ndarray | None = None):
        """`train_indices` restricts each training epoch to that subset of
        dataset positions (the complement can then serve as a held-out
        evaluation split for `evaluate()`); None trains on everything."""
        self.config = config
        self.architecture = architecture
        self.model_params = dict(model_params)
        self.dataset = dataset
        self.train_indices = (
            None if train_indices is None
            else np.asarray(train_indices, np.int64))
        self.model, _ = build_model(architecture, model_params)
        self.contract = get_model_contract(architecture)

        n_train = (len(dataset) if self.train_indices is None
                   else len(self.train_indices))
        steps_per_epoch = max(n_train // config.batch_size, 1)
        schedule = optax.cosine_decay_schedule(
            config.learning_rate, config.epochs * steps_per_epoch,
            alpha=config.min_lr_fraction,
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(schedule),
        )

        rng = jax.random.key(config.seed)
        variables = self.model.init(
            rng, jnp.zeros((2, 50, 9, 9), jnp.float32), train=False
        )
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            step=jnp.int32(0),
        )
        self._step = jax.jit(self._make_step())
        self.rng = np.random.default_rng(config.seed)

    def _make_step(self):
        cfg = self.config
        model = self.model
        contract = self.contract

        def loss_fn(params, batch_stats, batch):
            variables = {"params": params, "batch_stats": batch_stats}
            out, updates = model.apply(
                variables, batch["obs"], train=True, mutable=["batch_stats"]
            )
            B = batch["obs"].shape[0]
            flat = out.policy_logits.reshape(B, -1).astype(jnp.float32)
            logp = jax.nn.log_softmax(flat, axis=-1)
            policy_loss = -jnp.take_along_axis(
                logp, batch["policy"][:, None], axis=1
            )[:, 0].mean()
            if contract == "katago":
                vlogp = jax.nn.log_softmax(
                    out.value_logits.astype(jnp.float32), axis=-1
                )
                value_loss = -jnp.take_along_axis(
                    vlogp, batch["value"][:, None], axis=1
                )[:, 0].mean()
                score_loss = jnp.mean(
                    (out.score_lead[:, 0].astype(jnp.float32) - batch["score"]) ** 2
                )
            else:
                # scalar contract: tanh value vs {W:+1, D:0, L:-1}
                target = jnp.asarray([1.0, 0.0, -1.0])[batch["value"]]
                value_loss = jnp.mean(
                    (out.value[:, 0].astype(jnp.float32) - target) ** 2
                )
                score_loss = jnp.float32(0.0)
            loss = (cfg.lambda_policy * policy_loss
                    + cfg.lambda_value * value_loss
                    + cfg.lambda_score * score_loss)
            return loss, (policy_loss, value_loss, score_loss,
                          updates["batch_stats"])

        def step(state: TrainState, batch):
            (_, (pl, vl, sl_, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=params, batch_stats=bs,
                                   opt_state=opt_state, step=state.step + 1)
            return new_state, {"policy_loss": pl, "value_loss": vl,
                               "score_loss": sl_}

        return step

    def _make_eval_step(self):
        model = self.model
        contract = self.contract

        def step(state: TrainState, batch):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            out = model.apply(variables, batch["obs"], train=False)
            B = batch["obs"].shape[0]
            flat = out.policy_logits.reshape(B, -1).astype(jnp.float32)
            top1 = (flat.argmax(axis=-1) == batch["policy"]).sum()
            # top-5: is the target's logit within the 5 largest?
            kth = jax.lax.top_k(flat, 5)[0][:, -1]
            tgt = jnp.take_along_axis(flat, batch["policy"][:, None], axis=1)[:, 0]
            top5 = (tgt >= kth).sum()
            logp = jax.nn.log_softmax(flat, axis=-1)
            nll = -jnp.take_along_axis(
                logp, batch["policy"][:, None], axis=1)[:, 0].sum()
            if contract == "katago":
                vacc = (out.value_logits.argmax(axis=-1)
                        == batch["value"]).sum()
                smse = ((out.score_lead[:, 0].astype(jnp.float32)
                         - batch["score"]) ** 2).sum()
            else:
                target = jnp.asarray([1.0, 0.0, -1.0])[batch["value"]]
                pred = jnp.clip(jnp.round(out.value[:, 0]), -1, 1)
                vacc = (pred == target).sum()
                smse = jnp.float32(0.0)
            return {"top1": top1, "top5": top5, "nll": nll,
                    "value_acc": vacc, "score_se": smse}

        return step

    def evaluate(self, indices: np.ndarray,
                 batch_size: int | None = None) -> dict[str, float]:
        """Held-out metrics over a fixed index set: policy top-1/top-5
        accuracy, policy NLL, value-head accuracy, score MSE."""
        if not hasattr(self, "_eval_step"):
            self._eval_step = jax.jit(self._make_eval_step())
        bs = batch_size or self.config.batch_size
        totals = {"top1": 0.0, "top5": 0.0, "nll": 0.0,
                  "value_acc": 0.0, "score_se": 0.0}
        n = 0
        # drop_last keeps the jitted eval step at one static batch shape
        for batch in self.dataset.batches(bs, order=indices, drop_last=True):
            jb = {
                "obs": jnp.asarray(batch["observation"]).reshape(-1, 50, 9, 9),
                "policy": jnp.asarray(batch["policy_target"], jnp.int32),
                "value": jnp.asarray(batch["value_target"], jnp.int32),
                "score": jnp.asarray(batch["score_target"], jnp.float32),
            }
            m = self._eval_step(self.state, jb)
            for k in totals:
                totals[k] += float(m[k])
            n += len(jb["policy"])
        if n == 0:
            raise ValueError("evaluation split smaller than one batch")
        return {
            "positions": n,
            "policy_top1": totals["top1"] / n,
            "policy_top5": totals["top5"] / n,
            "policy_nll": totals["nll"] / n,
            "value_acc": totals["value_acc"] / n,
            "score_mse": totals["score_se"] / n,
        }

    def train_epoch(self) -> dict[str, float]:
        totals = {"policy_loss": 0.0, "value_loss": 0.0, "score_loss": 0.0}
        n = 0
        order = (None if self.train_indices is None
                 else self.rng.permutation(self.train_indices))
        for batch in self.dataset.batches(self.config.batch_size, self.rng,
                                          order=order):
            jb = {
                "obs": jnp.asarray(batch["observation"]).reshape(-1, 50, 9, 9),
                "policy": jnp.asarray(batch["policy_target"], jnp.int32),
                "value": jnp.asarray(batch["value_target"], jnp.int32),
                "score": jnp.asarray(batch["score_target"], jnp.float32),
            }
            self.state, metrics = self._step(self.state, jb)
            for k in totals:
                totals[k] += float(metrics[k])
            n += 1
        out = {k: v / max(n, 1) for k, v in totals.items()}
        out["batches"] = n
        logger.info(
            "SL epoch | policy=%.4f value=%.4f score=%.4f (%d batches)",
            out["policy_loss"], out["value_loss"], out["score_loss"], n,
        )
        return out

    def train(self) -> list[dict[str, float]]:
        return [self.train_epoch() for _ in range(self.config.epochs)]

    def save(self, path: str) -> str:
        save_checkpoint(
            path, self.state, epoch=0, architecture=self.architecture,
            rng_key=jax.random.key(self.config.seed),
            extra_meta={"phase": "sl", "model_params": self.model_params},
        )
        return path
