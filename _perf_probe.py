import time
import numpy as np, jax, jax.numpy as jnp
from keisei_tpu.env.vec_env import EnvCore

for N in (64,):
    core = EnvCore(num_envs=N, max_ply=200, num_channels=50)
    states, obs, mask = core.init()
    step = jax.jit(core.step_fn())
    actions = jnp.argmax(jnp.where(mask, 1.0, 0.0), axis=1).astype(jnp.int32)
    t0 = time.time()
    states2, out = step(states, actions)
    jax.block_until_ready(out.obs)
    t1 = time.time()
    print(f"N={N} first call (compile+run): {t1-t0:.1f}s")
    # steady state
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        states2, out = step(states2, jnp.argmax(jnp.where(out.legal_mask, 1.0, 0.0), axis=1).astype(jnp.int32))
    jax.block_until_ready(out.obs)
    dt = time.time() - t0
    print(f"N={N} steady: {dt/reps*1000:.1f} ms/step -> {N*reps/dt:,.0f} env-steps/s")
