"""Streaming CTC-greedy per-chunk latency (PERF.md streaming table).

Run on a real chip: python benchmarks/streaming_latency.py
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from mindaudio_tpu.models.asr_model import ASRModel
from mindaudio_tpu.utils.recognize import ASRInference

model = ASRModel(vocab_size=4233, input_dim=80, d_model=256, head_num=4,
                 ffn_dim=2048, num_encoder_layers=12, num_decoder_layers=6,
                 kernel_size=15, ctc_weight=0.3, causal_conv=True,
                 use_dynamic_chunk=True, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
batch = {
    "feats": jnp.asarray(rng.standard_normal((1, 128, 80)).astype(np.float32)),
    "feat_lens": jnp.asarray([128], jnp.int32),
    "labels": jnp.asarray([[1, 2, 3]], jnp.int32),
    "label_lens": jnp.asarray([3], jnp.int32),
    "ys_in": jnp.asarray([[4232, 1, 2, 3]], jnp.int32),
    "ys_out": jnp.asarray([[1, 2, 3, 4232]], jnp.int32),
    "ys_lens": jnp.asarray([4], jnp.int32),
}
params = model.init(jax.random.PRNGKey(0), batch)["params"]
inf = ASRInference(model, {"params": params})

C = 16                       # 16 subsampled frames/chunk = 640 ms of audio
raw = 4 * C + 3
cap = 128                    # ~5 s attention left context
n_chunks = 24                # ~15 s stream
feats = rng.standard_normal((1, 4 * C * n_chunks + 3, 80)).astype(np.float32)
chunks = [feats[:, lo: lo + raw] for lo in range(0, 4 * C * (n_chunks - 1) + 1, 4 * C)]

t0 = time.time()
inf.streaming_ctc_greedy(chunks, required_cache_size=cap)
print("first pass (all compiles):", round(time.time() - t0, 1), "s", flush=True)

# steady state: per-chunk latency once every cache shape is compiled
t0 = time.perf_counter()
inf.streaming_ctc_greedy(chunks, required_cache_size=cap)
dt = (time.perf_counter() - t0) / len(chunks)
print(json.dumps({
    "chunk_ms": round(dt * 1e3, 1),
    "chunk_audio_ms": C * 4 * 10,
    "streaming_rtf": round(dt / (C * 4 * 0.01), 4),
    "n_chunks": len(chunks), "cache_cap": cap,
}))
