"""Ablation sweep of the flagship conformer train step (PERF.md round-2 table).

Run on a real chip: python benchmarks/ablate_conformer.py [variant ...]

NOTE: bench.py::conformer_train_bench is the artifact-of-record measurement
(the driver runs it every round); this sweep deliberately keeps its own
parameterized copy of the step so variants can toggle pieces (dropout, rng
impl, loss branches, guards) that the bench hard-wires to the shipped
configuration. When changing the step structure, update both.
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp, optax

from mindaudio_tpu.models.asr_model import ASRModel
from mindaudio_tpu.ops.spectral import kaldi_fbank
from mindaudio_tpu.ops.specaugment import spec_augment
from mindaudio_tpu.train.state import TrainState, clip_by_global_norm, skip_nonfinite_update
from mindaudio_tpu.utils.common import add_sos_eos

SR = 16000

def build(batch_size=16, n_frames=1000, label_len=20, vocab=4233,
          ctc_weight=0.3, deterministic=False, rng_impl=None,
          fwd_only=False, remat=False, features_on=True, skip_guard=True):
    model = ASRModel(vocab_size=vocab, input_dim=80, d_model=256, head_num=4,
                     ffn_dim=2048, num_encoder_layers=12, num_decoder_layers=6,
                     kernel_size=15, ctc_weight=ctc_weight, remat=remat,
                     dtype=jnp.bfloat16)
    frame_len, frame_shift = 400, 160
    wav_len = n_frames * frame_shift + frame_len
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((batch_size, wav_len)).astype(np.float32) * 0.1
    labels = rng.integers(1, vocab - 1, (batch_size, label_len)).astype(np.int32)
    sos = eos = vocab - 1
    ys_in, ys_out = add_sos_eos(labels, sos, eos)
    batch = {
        "wavs": jnp.asarray(wavs),
        "wav_lens": jnp.full((batch_size,), wav_len, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lens": jnp.full((batch_size,), label_len, jnp.int32),
        "ys_in": jnp.asarray(ys_in.astype(np.int32)),
        "ys_out": jnp.asarray(ys_out.astype(np.int32)),
        "ys_lens": jnp.full((batch_size,), label_len + 1, jnp.int32),
    }

    def features(wavs, wav_lens, key):
        k_dither, k_aug = jax.random.split(key)
        feats = kaldi_fbank(wavs, num_mel_bins=80, dither=0.1, rng_key=k_dither)
        feat_lens = (1 + (wav_lens - frame_len) // frame_shift).astype(jnp.int32)
        feats = spec_augment(k_aug, feats)
        return feats, feat_lens

    def loss_fn(params, batch, key):
        k_feat, k_drop = jax.random.split(key)
        if features_on:
            feats, feat_lens = features(batch["wavs"], batch["wav_lens"], k_feat)
        else:
            feats = jnp.zeros((batch_size, n_frames + 1, 80), jnp.bfloat16)
            feat_lens = jnp.full((batch_size,), n_frames + 1, jnp.int32)
        rngs = {} if deterministic else {"dropout": k_drop}
        loss, metrics = model.apply(
            {"params": params}, dict(batch, feats=feats, feat_lens=feat_lens),
            deterministic=deterministic, rngs=rngs)
        return loss, metrics

    def step(state, batch):
        key = jax.random.fold_in(state.dropout_rng, state.step)
        if fwd_only:
            loss, _ = loss_fn(state.params, batch, key)
            return state.replace(step=state.step + 1), loss
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        grads, gnorm = clip_by_global_norm(grads, 5.0)
        if skip_guard:
            new_state = skip_nonfinite_update(
                state, state.apply_gradients(grads=grads), loss, grads=grads)
        else:
            new_state = state.apply_gradients(grads=grads)
        return new_state, loss

    params = model.init(
        jax.random.PRNGKey(0),
        {**{k: v for k, v in batch.items() if k not in ("wavs", "wav_lens")},
         "feats": jnp.zeros((batch_size, n_frames + 1, 80), jnp.float32),
         "feat_lens": jnp.full((batch_size,), n_frames + 1, jnp.int32)})["params"]
    dr = (jax.random.PRNGKey(1) if rng_impl is None
          else jax.random.key(1, impl=rng_impl))
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=optax.adamw(1e-3, weight_decay=1e-2),
                              dropout_rng=dr)
    return step, state, batch


def run(name, **kw):
    step, state, batch = build(**kw)
    jstep = jax.jit(step, donate_argnums=(0,))
    t0 = time.perf_counter()
    compiled = jstep.lower(state, batch).compile()
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        state, loss = compiled(state, batch)
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = compiled(state, batch)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"name": name, "step_ms": round(best * 100, 2),
                      "compile_s": round(compile_s, 1), **kw}), flush=True)


if __name__ == "__main__":
    for name, kw in [
        ("baseline", {}),
        ("no_dropout", {"deterministic": True}),
        ("rbg_rng", {"rng_impl": "rbg"}),
        ("ctc_only", {"ctc_weight": 1.0}),
        ("att_only", {"ctc_weight": 0.0}),
        ("fwd_only", {"fwd_only": True}),
        ("no_features", {"features_on": False}),
        ("no_skip_guard", {"skip_guard": False}),
        ("t_aligned_1027", {"n_frames": 1027}),
        ("rbg_aligned", {"n_frames": 1027, "rng_impl": "rbg"}),
        ("rbg_aligned_b32", {"n_frames": 1027, "rng_impl": "rbg", "batch_size": 32}),
        ("rbg_aligned_b64", {"n_frames": 1027, "rng_impl": "rbg", "batch_size": 64}),
    ]:
        if len(sys.argv) > 1 and name not in sys.argv[1:]:
            continue
        run(name, **kw)
