"""keisei-tpu: TPU-native shogi self-play deep-RL framework.

Subpackages: engine (rules core), env (vectorized + spectator envs),
models, training (fused PPO loops), league (opponent pool/tournaments),
sl (supervised warm start), db (observability), server (dashboard),
showcase (exhibitions), parallel (mesh + multi-host).
"""

__version__ = "0.2.0"
