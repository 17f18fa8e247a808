"""trafficbots_tpu: a TPU-native closed-loop traffic simulation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TrafficBots
(ICRA 2023, reference at /root/reference): multi-agent closed-loop traffic
policies on the Waymo Open Motion Dataset, with CVAE personality latents,
goal/destination conditioning, scheduled teacher forcing, differentiable
imitation reward through a 90-step autoregressive rollout, and WOMD-style
evaluation. The entire rollout is a single jitted `lax.scan`; data
parallelism shards scenes over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
