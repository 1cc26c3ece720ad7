"""ConcurrentMatchPool: P pairings play simultaneously in one device batch.

Capability parity with the reference's slot-partitioned pool
(keisei/training/concurrent_matches.py:171-625): `parallel_matches` slots x
`envs_per_match` lanes inside one batched environment. The reference
interleaves per-slot model forwards on a shared GPU; here each slot owns a
static env block and every step runs ONE vmapped forward over the 2P
stacked weight sets (a-side and b-side per slot) — one env step advances
every game of every pairing at once, so a round costs max-game-length
steps instead of sum-over-pairings(game length), and the program size /
compile time do not scale with P.

With `collect=True` / `"light"`, the pool also returns per-pairing
MatchRollout records (the sequential runner's contract, match.py:65-84),
sliced from the shared (T, P*E) scan trajectory. This lets TRAINING
pairings — which the reference must play one-at-a-time because only its
sequential path collects rollouts (keisei/training/tournament.py:352-467)
— ride the vmapped batch: the round-4 amortized campaign measured
sequential training pairings at ~65 s each (flagship b40c256), the
dominant cost of a 524 s tournament round.

All pairings in a pool share one architecture (weights swap per round
without retracing); heterogeneous-architecture pairings fall back to the
sequential per-pairing runner in LeagueTournament.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..env.vec_env import EnvCore
from .match import MatchResult, MatchRollout


@dataclass
class RoundStats:
    pairings: int
    games: int
    total_plies: int
    steps: int


class ConcurrentMatchPool:
    def __init__(
        self,
        model,
        parallel_matches: int = 4,
        envs_per_match: int = 16,
        max_ply: int = 512,
        num_channels: int = 50,
        # 128 (not 64): every chunk call pays a host dispatch + (lagged)
        # flag fetch over the device link; halving the call count takes
        # a measured ~35 s in-vivo round toward ~20 s. Over-run past
        # all-done costs < 0.5 s of benign auto-reset play per chunk.
        chunk_steps: int = 128,
        temperature: float = 1.0,
    ):
        self.model = model
        self.P = parallel_matches
        self.E = envs_per_match
        self.N = self.P * self.E
        self.max_ply = max_ply
        self.chunk_steps = chunk_steps
        self._stack_fn = None  # jitted whole-tree weight stacker (run_round)
        self.temperature = temperature
        self.core = EnvCore(self.N, max_ply, num_channels)
        self._chunks: dict[str, object] = {}  # collect mode -> compiled chunk

    def _chunk_for(self, collect):
        mode = "full" if collect is True else ("light" if collect == "light"
                                               else "none")
        if mode not in self._chunks:
            self._chunks[mode] = self._build_chunk(mode)
        return self._chunks[mode]

    def _build_chunk(self, mode: str = "none"):
        env_step = self.core.step_fn()
        P, E, N = self.P, self.E, self.N
        C = self.core.num_channels
        A = self.core.action_space
        model = self.model
        temperature = self.temperature

        def block_forward(variables, obs, masks, rng):
            out = model.apply(variables, obs.reshape(E, C, 9, 9), train=False)
            flat = out.policy_logits.reshape(E, -1).astype(jnp.float32)
            masked = jnp.where(masks, flat / temperature, -1e9)
            return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)

        vmapped_forward = jax.vmap(block_forward)

        def chunk(stacked_a, stacked_b, env_states, obs, masks, a_color,
                  done_seen, result, plies, rng):
            # One vmapped forward over all 2P weight sets instead of 2P
            # unrolled forwards: the HLO carries ONE copy of the trunk
            # (grouped convs over the stacked kernels), so compile time and
            # program size stop scaling with P — the unrolled flagship
            # chunk (8 x b40c256 in a 64-step scan body) took >10 min of
            # XLA compile — and each conv sees a 2P*E effective batch
            # instead of E, which the MXU tiles far better.
            stacked_ab = jax.tree.map(
                lambda xa, xb: jnp.concatenate([xa, xb]), stacked_a, stacked_b)

            def body(carry, _):
                env_states, obs, masks, done_seen, result, plies, rng = carry
                rng, k = jax.random.split(rng)
                keys = jax.random.split(k, 2 * P)
                obs_p = obs.reshape(P, E, -1)
                masks_p = masks.reshape(P, E, A)
                # key layout matches the historical unrolled order
                # (a-side p -> keys[2p], b-side p -> keys[2p+1])
                keys_ab = jnp.concatenate([keys[0::2], keys[1::2]])
                acts = vmapped_forward(
                    stacked_ab,
                    jnp.concatenate([obs_p, obs_p]),
                    jnp.concatenate([masks_p, masks_p]),
                    keys_ab,
                )
                act_a = acts[:P].reshape(N)
                act_b = acts[P:].reshape(N)
                stm = env_states.stm.astype(jnp.int32)
                actions = jnp.where(stm == a_color, act_a, act_b)

                env_states, out = env_step(env_states, actions)
                done = out.terminated | out.truncated
                fresh = done & ~done_seen
                win_color = jnp.where(
                    out.reward > 0, stm, jnp.where(out.reward < 0, 1 - stm, -1)
                )
                r = jnp.where(win_color < 0, 0,
                              jnp.where(win_color == a_color, 1, -1))
                result = jnp.where(fresh, r, result)
                plies = jnp.where(fresh, out.ply_count, plies)
                done_seen = done_seen | done
                carry = (env_states, out.obs, out.legal_mask, done_seen,
                         result, plies, rng)
                # ys layout mirrors match._make_chunk so per-slot slices
                # rebuild the sequential runner's MatchRollout record
                if mode == "full":
                    ys = (obs, actions, masks, out.reward, done, stm,
                          out.captured, out.term_reason)
                elif mode == "light":
                    ys = (actions, out.reward, done, stm,
                          out.captured, out.term_reason)
                else:
                    ys = None
                return carry, ys

            carry = (env_states, obs, masks, done_seen, result, plies, rng)
            carry, ys = jax.lax.scan(body, carry, None, length=self.chunk_steps)
            return carry, ys

        return jax.jit(chunk)

    def run_round(self, pairings, seed: int = 0, collect=False):
        """pairings: list of (vars_a, vars_b) pytrees, at most P; shorter
        rounds are padded with the last pairing (pad results discarded).

        collect=False -> (results, stats). collect=True / "light" ->
        (results, stats, rollouts) where rollouts[i] is pairing i's
        MatchRollout slice of the shared trajectory ("light" drops
        observations and legal masks, enough for feature extraction)."""
        empty = RoundStats(0, 0, 0, 0)
        if not pairings:
            return ([], empty, []) if collect else ([], empty)
        if len(pairings) > self.P:
            raise ValueError(f"{len(pairings)} pairings > pool capacity {self.P}")
        real = len(pairings)
        padded = list(pairings) + [pairings[-1]] * (self.P - real)
        # ONE jitted dispatch for the whole weight stack: eager per-leaf
        # jnp.stack costs a host dispatch per leaf — ~1000 round trips per
        # round at flagship depth, which WAS most of the in-vivo "play"
        # phase (docs/profiling-round5.md §3). Compiled once per tree
        # structure; weights are traced arguments, so entry changes never
        # retrace.
        if self._stack_fn is None:
            self._stack_fn = jax.jit(
                lambda ta, tb: (
                    jax.tree.map(lambda *xs: jnp.stack(xs), *ta),
                    jax.tree.map(lambda *xs: jnp.stack(xs), *tb),
                )
            )
        stacked_a, stacked_b = self._stack_fn(
            [p[0] for p in padded], [p[1] for p in padded])

        env_states, obs, masks = self.core.init()
        a_color = jnp.asarray(np.arange(self.N) % 2, jnp.int32)
        done_seen = jnp.zeros(self.N, bool)
        result = jnp.zeros(self.N, jnp.int32)
        plies = jnp.zeros(self.N, jnp.int32)
        rng = jax.random.key(seed)
        chunk = self._chunk_for(collect)

        collected = []
        steps = 0
        max_chunks = -(-self.max_ply // self.chunk_steps) + 1
        # PIPELINED early-exit: fetching done_seen after every chunk
        # serializes a host round trip per chunk — on a high-latency
        # device link those syncs dominate the round (measured ~2/3 of
        # in-vivo "play", docs/profiling-round5.md §3). Instead keep
        # dispatching chunks and check the flag from LAG chunks back: the
        # fetch then overlaps live device work. Cost when the exit fires:
        # up to LAG extra chunks (~0.5 s device each) of benign play —
        # done envs have auto-reset into fresh games of the SAME pairing,
        # whose collected transitions are legitimate extra data; per-env
        # results/plies froze at each env's FIRST terminal.
        LAG = 2 if self.chunk_steps < 128 else 1
        done_flags = []
        for i in range(max_chunks):
            (env_states, obs, masks, done_seen, result, plies, rng), ys = chunk(
                stacked_a, stacked_b, env_states, obs, masks, a_color,
                done_seen, result, plies, rng,
            )
            if collect:
                collected.append(ys)
            steps += self.chunk_steps
            done_flags.append(done_seen)
            if i >= LAG and bool(done_flags[i - LAG].all()):
                break

        done_np = np.asarray(done_seen).reshape(self.P, self.E)
        res_np = np.asarray(result).reshape(self.P, self.E)
        ply_np = np.asarray(plies).reshape(self.P, self.E)
        results = []
        for p in range(real):
            d = done_np[p]
            r = res_np[p][d]
            results.append(MatchResult(
                wins_a=int((r == 1).sum()),
                wins_b=int((r == -1).sum()),
                draws=int((r == 0).sum()),
                games=int(d.sum()),
                total_plies=int(ply_np[p][d].sum()),
            ))
        stats = RoundStats(
            pairings=real,
            games=sum(r.games for r in results),
            total_plies=sum(r.total_plies for r in results),
            steps=steps,
        )
        if not collect:
            return results, stats

        cat = [jnp.concatenate(parts, axis=0) for parts in zip(*collected)]
        if collect == "light":
            cat = [None, cat[0], None, *cat[1:]]
        rollouts = []
        for p in range(real):
            sl = slice(p * self.E, (p + 1) * self.E)
            rollouts.append(MatchRollout(
                obs=None if cat[0] is None else cat[0][:, sl],
                actions=cat[1][:, sl],
                legal_masks=None if cat[2] is None else cat[2][:, sl],
                rewards=cat[3][:, sl],
                dones=cat[4][:, sl],
                mover_color=cat[5][:, sl],
                captured=cat[6][:, sl],
                term_reason=cat[7][:, sl],
                a_color=a_color[sl],
            ))
        return results, stats, rollouts
