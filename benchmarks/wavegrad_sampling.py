"""WaveGrad sampling: 1000-step vs 6-step schedule (PERF.md).

Run on a real chip: python benchmarks/wavegrad_sampling.py
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from mindaudio_tpu.models.wavegrad import (
    WaveGrad, default_noise_schedule, fast_noise_schedule, reverse_diffusion)

model = WaveGrad()
rng = jax.random.PRNGKey(0)
mel = jax.random.normal(rng, (1, 30, 128))  # reference train crop: 30 frames
params = model.init(rng, mel, jax.random.normal(rng, (1, 30 * 300)),
                    jnp.array([0.5]))["params"]
apply_fn = lambda p, m, a, s: model.apply({"params": p}, m, a, s)

out = {}
for name, betas in [("steps_1000", default_noise_schedule()),
                    ("steps_6", fast_noise_schedule())]:
    f = jax.jit(lambda key: reverse_diffusion(params, apply_fn, mel, key,
                                              betas=jnp.asarray(betas), hop=300))
    t0 = time.time()
    f(rng).block_until_ready()
    print(name, "compile+first:", round(time.time() - t0, 1), "s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(rng).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    out[name + "_ms"] = round(best * 1e3, 1)
out["speedup"] = round(out["steps_1000_ms"] / out["steps_6_ms"], 1)
audio_s = 30 * 300 / 22050
out["rtf_6step"] = round(out["steps_6_ms"] / 1e3 / audio_s, 4)
print(json.dumps(out))
