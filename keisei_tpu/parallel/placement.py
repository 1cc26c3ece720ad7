"""Per-role device placement: pin host-side roles to specific local chips.

The reference gives each training-adjacent role its own accelerator via
device strings — learner on GPU 0, tournament on GPU 1
(keisei-500k-league.toml:81-84 `opponent_device`/`tournament_device`).
The TPU-native equivalent: the learner's SPMD program runs over its mesh
(`[distributed] num_devices` — the first N local devices), while
single-device roles (in-process tournament rounds, sidecar workers,
dynamic updates riding the tournament) are pinned with
`jax.default_device` to a chip OUTSIDE that mesh, so match play never
contends with the learner's rollout/update programs.

Device specs (config `tournament_device`, worker `--device`):
  None / "default"  ambient placement (device 0 / the learner's chips)
  "cpu"             host CPU (sidecar workers on a box without spare chips)
  "3"               local device index 3
  "tpu:3"           same, asserting the platform
The reference's "cuda:1" strings parse too ("cuda" asserting a CUDA
backend, which on this stack simply fails fast with the platform message).
"""

from __future__ import annotations

import contextlib

import jax


def parse_device(spec):
    """Resolve a device spec to a jax.Device, or None for ambient placement.

    Raises ValueError for an unknown platform or out-of-range index so a
    misconfigured pod job fails at startup, not mid-round.
    """
    if spec is None or spec == "default":
        return None
    if isinstance(spec, int):
        platform, index = None, spec
    else:
        s = str(spec).strip()
        if ":" in s:
            platform, _, idx = s.partition(":")
            platform = platform.lower()
            index = int(idx)
        elif s.isdigit():
            platform, index = None, int(s)
        else:
            # bare platform name: first device of that platform ("cpu")
            platform, index = s.lower(), 0
    try:
        devices = jax.devices(platform) if platform else jax.devices()
    except RuntimeError as e:
        raise ValueError(
            f"device spec {spec!r}: no {platform!r} backend available ({e})"
        ) from e
    if index >= len(devices):
        raise ValueError(
            f"device spec {spec!r}: index {index} out of range — "
            f"{len(devices)} {platform or 'local'} device(s) visible"
        )
    return devices[index]


def device_context(spec):
    """Context manager pinning default placement to the spec'd device
    (nullcontext for ambient). Jitted programs entered under it compile
    for and run on that device unless they carry explicit shardings."""
    dev = parse_device(spec)
    if dev is None:
        return contextlib.nullcontext()
    return jax.default_device(dev)
