"""WaveGrad sampling: 1000-step vs 6-step schedule (PERF.md).

Also the VERDICT-r2 compile diagnosis: round 2 measured "compile+first
17 min" for the 1000-step sampler by jitting a closure over params/mel —
which embeds the full weight set as PROGRAM CONSTANTS. This version passes
params/mel as arguments (no constant embedding, donation-friendly) and
times trace/lower, compile, and execution separately so a slow backend
compile can't be confused with first-call execution.

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
    # betas stays HOST NumPy (the documented reverse_diffusion contract and
    # what examples/wavegrad/reverse.py passes). jnp.asarray here forces a
    # mid-trace device_get of a freshly-staged tunnel array, which scales
    # with the schedule length (~0.33 s/element -> 332 s "lowering" at 1000
    # steps, measured) while host constants lower in <1 s.

    def sample(params, mel, key, betas=betas):
        audio = reverse_diffusion(params, apply_fn, mel, key, betas=betas,
                                  hop=300)
        # scalar tail: timing fetches this, forcing the whole scan — over
        # the remote tunnel, block_until_ready on an unfetched array does
        # NOT force device execution (see benchmarks/quant_kernel.py note)
        return audio, jnp.sum(audio)

    f = jax.jit(sample)
    t0 = time.time()
    lowered = f.lower(params, mel, rng)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    float(compiled(params, mel, rng)[1])
    t3 = time.time()
    print(f"{name}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s "
          f"first-exec {t3-t2:.1f}s", flush=True)
    out[name + "_compile_s"] = round(t2 - t1, 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(params, mel, rng)[1])
        best = min(best, time.perf_counter() - t0)
    out[name + "_ms"] = round(best * 1e3, 1)
out["speedup"] = round(out["steps_1000_ms"] / out["steps_6_ms"], 1)
audio_s = 30 * 300 / 22050
out["rtf_6step"] = round(out["steps_6_ms"] / 1e3 / audio_s, 4)
print(json.dumps(out))
