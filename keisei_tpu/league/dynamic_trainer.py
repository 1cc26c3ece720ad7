"""Online PPO for Dynamic league entries from tournament rollouts.

Capability parity with the reference DynamicTrainer
(keisei/training/dynamic_trainer.py:41-418): per-entry rollout buffers,
perspective-filtered batches, eval-mode old_log_probs, reward-signed
terminal-only advantages, PPO clip + WDL cross-entropy (no entropy bonus,
no score head — Dynamic entries are short-lived opponents, not the primary
agent), scaled learning rate, persisted per-entry optimizers, and circuit
breakers (per-entry consecutive-error disable, global error-rate window,
update rate limit).

TPU deltas: the update is one jitted program over a FIXED-size transition
window (the most recent `batch_cap` transitions, zero-weight padded) so
varying match lengths never retrace. Perspective filtering happens
host-side at buffering time (record_rollout selects the entry's
mover-seat transitions and stores compact numpy arrays — device-resident
buffers exhausted HBM); the jitted update then only sees the fixed-size
weighted window.
"""

from __future__ import annotations

import logging
import time
from collections import OrderedDict, deque

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import DynamicConfig
from .match import MatchRollout
from .store import OpponentEntry, OpponentStore

logger = logging.getLogger(__name__)


def _plan_chunks(cap: int, step_batch: int) -> tuple[int, int]:
    """Minibatch plan for a padded batch of `cap` rows: the number of scan
    steps and rows per step, with EVERY step <= step_batch rows.

    ceil-div, not exact-div: a cap that is not a multiple of step_batch must
    never collapse to one full-batch step — that reintroduces the flagship
    OOM this chunking exists to prevent (review r2). When chunks does not
    divide cap, a pass trains on the first chunks*chunk entries of the
    per-epoch permutation, dropping < chunks random rows of a
    weight-padded batch."""
    chunks = max(1, -(-cap // step_batch))
    return chunks, cap // chunks


def _make_update_fn(model, cfg: DynamicConfig, optimizer, clip_epsilon: float = 0.2,
                    contract: str = "katago", step_batch: int = 1024,
                    num_actions: int | None = None):
    """Jitted: (variables, opt_state, batch, rng) -> (params', opt', metrics)."""

    def old_logp(variables, obs, masks, actions):
        out = model.apply(variables, obs, train=False)
        flat = out.policy_logits.reshape(obs.shape[0], -1).astype(jnp.float32)
        logp = jax.nn.log_softmax(jnp.where(masks, flat, -1e9), axis=-1)
        return jnp.take_along_axis(logp, actions[:, None], axis=1)[:, 0]

    def loss_fn(params, batch_stats, batch, old_lp):
        variables = {"params": params, "batch_stats": batch_stats}
        out, updates = model.apply(
            variables, batch["obs"], train=True, mutable=["batch_stats"]
        )
        B = batch["obs"].shape[0]
        flat = out.policy_logits.reshape(B, -1).astype(jnp.float32)
        logp = jax.nn.log_softmax(jnp.where(batch["masks"], flat, -1e9), axis=-1)
        new_lp = jnp.take_along_axis(logp, batch["actions"][:, None], axis=1)[:, 0]
        w = batch["weights"]
        w_sum = jnp.maximum(w.sum(), 1.0)

        # reward-signed terminal-only advantage (dynamic_trainer.py:352-356)
        adv = batch["rewards"] * batch["dones"].astype(jnp.float32)
        ratio = jnp.exp(new_lp - old_lp)
        surr = jnp.minimum(
            ratio * adv, jnp.clip(ratio, 1 - clip_epsilon, 1 + clip_epsilon) * adv
        )
        policy_loss = -(surr * w).sum() / w_sum

        if contract == "katago":
            vlogits = out.value_logits.astype(jnp.float32)
            vlogp = jax.nn.log_softmax(vlogits, axis=-1)
            cats = batch["value_cats"]
            cat_valid = (cats >= 0) & (w > 0)
            ce = -jnp.take_along_axis(
                vlogp, jnp.maximum(cats, 0)[:, None], axis=1
            )[:, 0]
            n_cat = jnp.maximum(cat_valid.sum(), 1)
            value_loss = jnp.where(cat_valid, ce, 0.0).sum() / n_cat
            value_loss = jnp.where(cat_valid.any(), value_loss, vlogits.sum() * 0.0)
        else:
            # scalar contract: MSE vs terminal reward on terminal rows
            v = out.value[:, 0].astype(jnp.float32)
            wv = w * batch["dones"].astype(jnp.float32)
            value_loss = (((v - batch["rewards"]) ** 2) * wv).sum() / jnp.maximum(
                wv.sum(), 1.0
            )

        loss = policy_loss + value_loss
        return loss, {"policy_loss": policy_loss, "value_loss": value_loss,
                      "batch_stats": updates["batch_stats"]}

    def decompress(batch):
        """Device-side decode of the transfer-compressed batch: obs ride
        the host->device tunnel as f16 and legal masks as packed bitplanes
        (_build_batch), cutting upload bytes ~3x — the tunnel runs
        ~15 MB/s and an uncompressed flagship batch is ~112 MB. Plain
        (f32/bool) batches pass through untouched (dtype is static at
        trace time), so hand-built test batches keep working."""
        out = dict(batch)
        if out["obs"].dtype != jnp.float32:
            out["obs"] = out["obs"].astype(jnp.float32)
        m = out["masks"]
        if m.dtype == jnp.uint8:
            assert num_actions is not None, (
                "packed masks need num_actions at update-fn build time")
            bits = (m[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            out["masks"] = bits.reshape(m.shape[0], -1)[:, :num_actions]
            out["masks"] = out["masks"].astype(bool)
        return out

    def update(variables, opt_state, batch, rng):
        batch = decompress(batch)
        old_lp = old_logp(variables, batch["obs"], batch["masks"], batch["actions"])
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        cap = batch["obs"].shape[0]
        # fwd+bwd over the whole padded batch in one shot does not fit HBM
        # at flagship depth (b40c256 x 4096 needs ~4x the main update's
        # bs=1024 working set — the round-2 soak's first dynamic update
        # OOMed exactly here); scan minibatch steps like the main PPO update
        chunks, chunk = _plan_chunks(cap, step_batch)

        def one_step(carry, ix):
            params, batch_stats, opt_state = carry
            mb = {k: v[ix] for k, v in batch.items()}
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, mb, old_lp[ix]
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, aux["batch_stats"], opt_state), {
                "policy_loss": aux["policy_loss"], "value_loss": aux["value_loss"],
            }

        def one_epoch(carry, key):
            idx = jax.random.permutation(key, cap)[: chunks * chunk]
            idx = idx.reshape(chunks, chunk)
            carry, m = jax.lax.scan(one_step, carry, idx)
            return carry, jax.tree.map(lambda x: x.mean(), m)

        keys = jax.random.split(rng, cfg.update_epochs_per_batch)
        (params, batch_stats, opt_state), metrics = jax.lax.scan(
            one_epoch, (params, batch_stats, opt_state), keys
        )
        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        return {"params": params, "batch_stats": batch_stats}, opt_state, metrics

    return jax.jit(update)


class DynamicTrainer:
    """Rate-limited, fault-isolated online trainer for Dynamic entries."""

    def __init__(
        self,
        store: OpponentStore,
        model,
        config: DynamicConfig,
        learner_lr: float = 2e-4,
        batch_cap: int = 4096,
        contract: str = "katago",
        step_batch: int = 1024,
    ):
        self.store = store
        self.model = model
        self.contract = contract
        self.config = config
        self.learner_lr = learner_lr
        self.batch_cap = batch_cap
        self.step_batch = min(step_batch, batch_cap)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(learner_lr * config.lr_scale),
        )
        self._update_fns: dict[tuple, object] = {}  # (id(model), A)
        self.architecture: str | None = None  # set to gate entries by arch
        self._buffers: dict[int, deque] = {}
        self._opt_states: dict[int, object] = {}  # in-memory Adam continuity
        # entries whose moments are DEVICE-resident right now (insertion =
        # LRU order). offload_optimizer demotes past optimizer_device_cache
        # to host — each demotion/promotion is a 2x-params tunnel round
        # trip, the dominant in-vivo tournament cost at flagship scale
        self._opt_on_device: OrderedDict[int, None] = OrderedDict()
        self._match_counts: dict[int, int] = {}
        self._error_counts: dict[int, int] = {}
        self._disabled: set[int] = set()
        self._updates_since_flush: dict[int, int] = {}
        self._num_actions: int | None = None
        self._updates_this_round = 0
        self._recent_update_times: deque[float] = deque(maxlen=64)
        self._recent_errors: deque[float] = deque(maxlen=64)
        self._globally_disabled_until = 0.0

    # -- data intake -------------------------------------------------------

    def record_rollout(self, entry_id: int, rollout: MatchRollout, side: str) -> None:
        """Compact to the entry's own transitions and buffer on the HOST.

        The raw MatchRollout holds (T, N) device arrays — obs alone is
        T*N*4050 f32, hundreds of MB per match — and buffering those
        device-side exhausts HBM after a few tournament rounds
        (max_buffer_depth * dynamic slots * ~300 MB). The reference
        buffers CPU tensors (dynamic_trainer.py:163-200); match that:
        select the entry's mover-seat transitions on device, cap at
        batch_cap (newest win), fetch once, store numpy.

        Terminal outcomes are propagated to BOTH sides before the mover
        filter. VecEnv rewards sit on the last mover's row, so after
        filtering, an entry that gets checkmated keeps no done=True row at
        all: its advantage (rewards*dones) and WDL targets are zero for
        every game it loses — the reference inherits exactly this blind
        spot (its flat perspective-filtered buffers discard the structure
        needed to fix it, dynamic_trainer.py:163-200 + match_utils.py:262).
        Here the (T, N) rollout is still intact, and shogi strictly
        alternates movers, so the opponent's final move of a game ending
        at step t is always row t-1: mirror the outcome there with the
        sign flipped (negamax), labelling the loser's last action with
        done=True / reward=-1 (and both sides of a draw with 0).
        """
        self._match_counts[entry_id] = self._match_counts.get(entry_id, 0) + 1
        if rollout.obs is None or rollout.legal_masks is None:
            return  # "light" collection carries nothing trainable
        color = rollout.a_color if side == "a" else 1 - rollout.a_color
        mine = np.asarray(rollout.mover_color == color[None, :]).reshape(-1)
        idx = np.nonzero(mine)[0]
        if idx.size == 0:
            return
        # Per-MATCH fetch cap: _build_batch keeps the newest `batch_cap`
        # rows of the whole buffer (depth `max_buffer_depth` matches), so
        # fetching more than batch_cap/depth rows per match pays tunnel
        # bytes for rows the update window can never hold. The axon
        # device->host tunnel runs ~15 MB/s (profiles/tournament-round.json)
        # — at the old per-match batch_cap this was ~13 s per training
        # pairing of pure transfer.
        # floor clamped to batch_cap: with a small batch_cap a bare 256
        # floor would make depth*cap exceed the window this cap exists to
        # respect (ADVICE r4). Note pool slots carry envs_per_match games
        # per training match (vs the old 64-env sequential match), so an
        # entry's window fills ~4x more slowly per match — tune
        # update_every_matches with that in mind.
        cap = max(min(256, self.batch_cap),
                  self.batch_cap // max(1, self.config.max_buffer_depth))
        n = min(idx.size, cap)
        sel = idx[-n:]
        if n < cap:
            # pad to the FIXED cap with duplicates of the newest row (host
            # slice below drops them): a variable row count would retrace
            # the eager gather/pack chain per new shape (~6 s each,
            # measured on the axon tunnel); padded, it compiles once per
            # quantized T
            sel = np.concatenate([sel, np.full(cap - n, sel[-1], sel.dtype)])
        T, N = rollout.actions.shape
        take = jnp.asarray(sel)

        def gather(a):
            # eager = async dispatch; nothing blocks until the fetch below
            return jnp.take(a.reshape(T * N, *a.shape[2:]), take, axis=0)

        rewards, dones = rollout.rewards, rollout.dones
        if T > 1:
            # a done at t whose predecessor row belongs to the same game
            # (not itself terminal) and to the other mover gets mirrored
            # onto that predecessor; auto-reset boundaries (done at t-1)
            # and same-mover rows (first move of a fresh game) are excluded
            mirror = (dones[1:] & ~dones[:-1]
                      & (rollout.mover_color[1:] != rollout.mover_color[:-1]))
            rewards = rewards.at[:-1].set(
                jnp.where(mirror, -rewards[1:], rewards[:-1]))
            dones = dones.at[:-1].set(dones[:-1] | mirror)

        # ONE host fetch for all five arrays (separate np.asarray calls
        # would each pay a sync round trip through the dispatch tunnel;
        # jitting this instead would retrace per distinct match length).
        # Transfer-compressed: obs ride as f16 (normalized plane values;
        # ~1e-4 rounding is immaterial for the opponent trainer) and legal
        # masks as packed bitplanes (8x) — both restored to the buffer's
        # f32/bool contract right here, so _build_batch and tests see the
        # unchanged host format.
        masks_g = gather(rollout.legal_masks)
        A = masks_g.shape[-1]
        pad = (-A) % 8
        mp = jnp.pad(masks_g, ((0, 0), (0, pad))).reshape(
            masks_g.shape[0], -1, 8).astype(jnp.uint8)
        packed = (mp * jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128],
                                   jnp.uint8)).sum(-1).astype(jnp.uint8)
        compact = jax.device_get({
            "obs": gather(rollout.obs).astype(jnp.float16),
            "actions": gather(rollout.actions),
            "masks": packed,
            "rewards": gather(rewards),
            "dones": gather(dones),
        })
        compact = {k: v[:n] for k, v in compact.items()}  # drop pad rows
        compact["obs"] = compact["obs"].astype(np.float32)
        compact["masks"] = np.unpackbits(
            compact["masks"], axis=1, bitorder="little")[:, :A].astype(bool)
        buf = self._buffers.setdefault(
            entry_id, deque(maxlen=self.config.max_buffer_depth)
        )
        buf.append(compact)

    def disabled_entries(self) -> set[int]:
        return set(self._disabled)

    # -- cache lifecycle -------------------------------------------------------

    def drop_entry(self, entry_id: int) -> None:
        """Free all cached per-entry state.

        _opt_states holds device-resident Adam moments and _buffers host
        rollout batches; without eviction both grow unboundedly as dynamic
        entries cycle over long league runs (ADVICE r1)."""
        self._buffers.pop(entry_id, None)
        self._opt_states.pop(entry_id, None)
        self._opt_on_device.pop(entry_id, None)
        self._match_counts.pop(entry_id, None)
        self._error_counts.pop(entry_id, None)
        self._updates_since_flush.pop(entry_id, None)
        self._disabled.discard(entry_id)

    def retain_only(self, active_ids) -> None:
        """Evict caches for entries no longer in the dynamic tier.

        Called as a reconciliation sweep after tier reviews: retirement and
        eviction happen from several paths (overflow review, hard caps,
        frontier promotion), so sweeping against the live role listing is
        more robust than hooking each one."""
        active = set(active_ids)
        cached = (
            set(self._buffers) | set(self._opt_states) | set(self._match_counts)
            | set(self._error_counts) | set(self._updates_since_flush)
        )
        for eid in cached - active:
            self.drop_entry(eid)

    # -- gating --------------------------------------------------------------

    def _rate_limited(self) -> bool:
        now = time.monotonic()
        recent = [t for t in self._recent_update_times if now - t < 60.0]
        return len(recent) >= self.config.max_updates_per_minute

    def _globally_disabled(self) -> bool:
        now = time.monotonic()
        if now < self._globally_disabled_until:
            return True
        window = self.config.global_error_window_seconds
        errors = [t for t in self._recent_errors if now - t < window]
        if len(errors) >= self.config.global_error_threshold:
            self._globally_disabled_until = now + window
            logger.error(
                "dynamic training globally disabled for %.0fs (%d errors)",
                window, len(errors),
            )
            return True
        return False

    def begin_round(self) -> None:
        """Reset the per-round update budget (called at round start by the
        tournament / per claimed batch by the sidecar worker). The cap
        bounds the worst-case round duration the overlapped training epoch
        must absorb — the per-minute rate limit alone lets a backlogged
        round monopolize the device."""
        self._updates_this_round = 0

    def should_update(self, entry_id: int) -> bool:
        if not self.config.training_enabled:
            return False
        if entry_id in self._disabled or self._globally_disabled():
            return False
        if self._updates_this_round >= self.config.max_updates_per_round:
            return False
        if self._rate_limited():
            return False
        count = self._match_counts.get(entry_id, 0)
        return count > 0 and count % self.config.update_every_matches == 0

    # -- update -----------------------------------------------------------------

    def _park_opt_state(self, entry_id: int, opt_state) -> None:
        """Keep the freshly-updated moments DEVICE-resident in a bounded
        LRU; demote the coldest past `optimizer_device_cache` to the host.

        Tournament rounds train the same few entries repeatedly, so with
        K>=1 most updates skip both tunnel legs of the old
        offload-every-update policy (~50 s/update at b40c256 over the
        15 MB/s axon tunnel — the dominant in-vivo round cost,
        docs/profiling-round5.md). HBM stays bounded at K x 2 x params."""
        if not self.config.offload_optimizer:
            self._opt_states[entry_id] = opt_state  # legacy: all on device
            return
        cache = self.config.optimizer_device_cache
        if cache <= 0:
            self._opt_states[entry_id] = jax.device_get(opt_state)
            return
        self._opt_states[entry_id] = opt_state
        self._opt_on_device[entry_id] = None
        self._opt_on_device.move_to_end(entry_id)
        while len(self._opt_on_device) > cache:
            victim, _ = self._opt_on_device.popitem(last=False)
            if victim in self._opt_states:
                self._opt_states[victim] = jax.device_get(
                    self._opt_states[victim])

    def _build_batch(self, entry_id: int) -> dict | None:
        """Flatten buffered rollouts into one fixed-size weighted batch.

        A transition belongs to the entry when its mover seat matches the
        entry's color in that match; rewards flip to the entry's perspective
        implicitly (mover == entry, so last-mover rewards ARE entry-persp).
        """
        buf = self._buffers.get(entry_id)
        if not buf:
            return None
        # buffered records are host-side, already perspective-filtered and
        # per-rollout capped (record_rollout); assemble on host, upload once
        cat = {k: np.concatenate([c[k] for c in buf]) for k in buf[0]}
        S = cat["obs"].shape[0]
        cap = self.batch_cap
        weights = np.ones(S, np.float32)
        if S > cap:  # most recent transitions win
            cat = {k: v[-cap:] for k, v in cat.items()}
            weights = weights[-cap:]
        elif S < cap:
            pad = cap - S
            cat = {
                k: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
                for k, v in cat.items()
            }
            weights = np.concatenate([weights, np.zeros(pad, np.float32)])
        # transfer compression for the upload (mirror of record_rollout's
        # D2H compression): obs as f16 (normalized plane values; ~1e-4
        # rounding), masks as packed bitplanes (exact) — the jitted
        # update's decompress() restores both device-side. Uncompressed a
        # flagship batch is ~112 MB against a ~15 MB/s tunnel.
        self._num_actions = int(cat["masks"].shape[1])
        cat["obs"] = cat["obs"].astype(np.float16)
        cat["masks"] = np.packbits(cat["masks"], axis=1, bitorder="little")
        batch = {k: jnp.asarray(v) for k, v in cat.items()}
        batch["weights"] = jnp.asarray(weights)
        # WDL cats from terminal rewards (truncation -> draw, by design)
        term = batch["dones"]
        r = batch["rewards"]
        cats = jnp.where(r > 0, 0, jnp.where(r < 0, 2, 1))
        batch["value_cats"] = jnp.where(term, cats, -1).astype(jnp.int32)
        # obs to model layout
        batch["obs"] = batch["obs"].reshape(cap, -1, 9, 9)
        return batch

    def maybe_update(self, entry: OpponentEntry, seed: int = 0) -> bool:
        """Run one training update if gates allow. Returns True on success."""
        if not self.should_update(entry.id):
            return False
        if self.architecture is not None and entry.architecture != self.architecture:
            logger.info(
                "dynamic entry %d arch %s != trainer arch %s — skipping",
                entry.id, entry.architecture, self.architecture,
            )
            return False
        try:
            return self._update_inner(entry, seed)
        except Exception:
            logger.exception("dynamic update failed for entry %d", entry.id)
            self._recent_errors.append(time.monotonic())
            n = self._error_counts.get(entry.id, 0) + 1
            self._error_counts[entry.id] = n
            if self.config.disable_on_error and n >= self.config.max_consecutive_errors:
                self._disabled.add(entry.id)
                self.store.set_training_enabled(entry.id, False)
                logger.error("dynamic entry %d disabled after %d errors", entry.id, n)
            return False

    def _update_inner(self, entry: OpponentEntry, seed: int) -> bool:
        batch = self._build_batch(entry.id)
        if batch is None or float(batch["weights"].sum()) == 0.0:
            return False
        variables = self.store.load_variables_cached(entry)
        if "batch_stats" not in variables:
            variables = {**variables, "batch_stats": {}}
        # bf16 snapshots (storage.snapshot_dtype) cast up before training:
        # Adam moments and weight deltas in bf16 would visibly degrade the
        # update; after the first update the entry's own generations are
        # written f32 again, so the cast is one-time per clone
        variables = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
            variables)
        # Adam moments live in memory between updates (disk flushes happen
        # every checkpoint_flush_every for restart continuity; reloading
        # from disk each update would reset or stale the moments, since
        # the save cadence lags the update cadence)
        opt_state = self._opt_states.get(entry.id)
        if opt_state is None:
            opt_state = self.store.load_optimizer(
                entry, template=self.optimizer.init(variables["params"])
            ) or self.optimizer.init(variables["params"])

        key = (id(self.model), self._num_actions)
        if key not in self._update_fns:
            self._update_fns[key] = _make_update_fn(
                self.model, self.config, self.optimizer,
                contract=self.contract, step_batch=self.step_batch,
                num_actions=self._num_actions,
            )
        new_vars, opt_state, metrics = self._update_fns[key](
            variables, opt_state, batch, jax.random.key(seed)
        )
        pl = float(metrics["policy_loss"])
        if not np.isfinite(pl):
            raise RuntimeError(f"non-finite dynamic policy loss: {pl}")

        # architectures without batch_stats (mlp/scalar) must not persist an
        # empty batch_stats collection: add_entry never writes one, and a
        # disk tree carrying it breaks Orbax template restores against the
        # learner's (batch_stats-free) variables (found live in an mlp
        # league resume; store._restore also tolerates pre-existing trees)
        if not new_vars.get("batch_stats"):
            new_vars = {k: v for k, v in new_vars.items()
                        if k != "batch_stats"}

        # device tree handed over directly: the store seeds its LRU with it
        # (no D2H + disk round trip) and flushes to Orbax in the background.
        # update_weights can raise (a prior async flush failed) — it must
        # come BEFORE the Adam moments are persisted, or a discarded weight
        # update would leave cached moments one step ahead of the entry's
        # actual weights (review r2)
        n_upd = self._updates_since_flush.get(entry.id, 0) + 1
        flush = ("async" if n_upd % self.config.weight_flush_every == 0
                 else "defer")
        self.store.update_weights(entry.id, new_vars, flush=flush)
        self._park_opt_state(entry.id, opt_state)
        self._updates_since_flush[entry.id] = (
            self._updates_since_flush.get(entry.id, 0) + 1
        )
        if self._updates_since_flush[entry.id] % self.config.checkpoint_flush_every == 0:
            self.store.save_optimizer(entry.id, jax.device_get(opt_state))
        self._recent_update_times.append(time.monotonic())
        self._updates_this_round += 1
        self._error_counts[entry.id] = 0
        logger.info(
            "dynamic update: entry %d policy_loss=%.4f value_loss=%.4f",
            entry.id, pl, float(metrics["value_loss"]),
        )
        return True
