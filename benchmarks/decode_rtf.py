"""Batched vs sequential attention-rescoring RTF (PERF.md decode table).

Run on a real chip: python benchmarks/decode_rtf.py
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from mindaudio_tpu.models.asr_model import ASRModel
from mindaudio_tpu.utils.recognize import ASRInference

SR = 16000
B, SECONDS = 16, 10

model = ASRModel(vocab_size=4233, input_dim=80, d_model=256, head_num=4,
                 ffn_dim=2048, num_encoder_layers=12, num_decoder_layers=6,
                 kernel_size=15, ctc_weight=0.3, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
feats = rng.standard_normal((B, 1028, 80)).astype(np.float32)
feat_lens = np.full((B,), 998, np.int32)
batch = {
    "feats": jnp.asarray(feats), "feat_lens": jnp.asarray(feat_lens),
    "labels": jnp.asarray(rng.integers(1, 4000, (B, 8)).astype(np.int32)),
    "label_lens": jnp.full((B,), 8, jnp.int32),
    "ys_in": jnp.asarray(rng.integers(1, 4000, (B, 9)).astype(np.int32)),
    "ys_out": jnp.asarray(rng.integers(1, 4000, (B, 9)).astype(np.int32)),
    "ys_lens": jnp.full((B,), 9, jnp.int32),
}
params = model.init(jax.random.PRNGKey(0), batch)["params"]
inf = ASRInference(model, {"params": params}, beam_size=10, max_tgt_len=50)

# warm (compile both programs)
t0 = time.time()
inf.attention_rescoring_batch(feats, feat_lens)
print("compile+first batch:", round(time.time() - t0, 1), "s", flush=True)

dt_batch = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    res = inf.attention_rescoring_batch(feats, feat_lens)
    dt_batch = min(dt_batch, time.perf_counter() - t0)

# sequential batch-1 for comparison (compiles new B=1 shapes)
t0 = time.time()
inf.attention_rescoring(feats[:1], feat_lens[:1])
print("compile b1:", round(time.time() - t0, 1), "s", flush=True)
t0 = time.perf_counter()
for b in range(4):
    inf.attention_rescoring(feats[b:b+1], feat_lens[b:b+1])
dt_seq = (time.perf_counter() - t0) / 4

# greedy for context
inf.ctc_greedy_search(feats, feat_lens)
t0 = time.perf_counter()
inf.ctc_greedy_search(feats, feat_lens)
dt_greedy = time.perf_counter() - t0

audio_s = B * SECONDS
print(json.dumps({
    "rescoring_batch16_ms": round(dt_batch * 1e3, 1),
    "rescoring_batch_rtf": round(dt_batch / audio_s, 5),
    "rescoring_seq_per_utt_ms": round(dt_seq * 1e3, 1),
    "rescoring_seq_rtf": round(dt_seq / SECONDS, 5),
    "greedy_batch16_ms": round(dt_greedy * 1e3, 1),
    "greedy_rtf": round(dt_greedy / audio_s, 6),
}))
