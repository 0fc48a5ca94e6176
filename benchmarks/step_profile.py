"""Flagship train-step profile: slope-timed ablation at the bench config
(B=32 x 10 s, 46.2M params, one chip).

Every variant is the full jitted step with one piece changed; the slope
between two chain lengths cancels the per-call tunnel dispatch, so the
deltas are device time. Prints one JSON line per variant plus a summary.

Usage: python benchmarks/step_profile.py [variant ...]
(default: all variants)
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

SR = 16000


def build(int8=False, dropout=True, ctc_weight=0.3, features=True,
          optimizer=True, forward_only=False, batch_size=32,
          attn_dropout=0.0):
    import jax, jax.numpy as jnp, optax
    from mindaudio_tpu.models.asr_model import ASRModel
    from mindaudio_tpu.ops.spectral import kaldi_fbank
    from mindaudio_tpu.ops.specaugment import spec_augment
    from mindaudio_tpu.train.state import (TrainState, as_dropout_key,
        clip_by_global_norm, fast_dropout_rng, skip_nonfinite_update)
    from mindaudio_tpu.utils.common import add_sos_eos

    seconds, label_len, vocab = 10, 20, 4233
    model = ASRModel(vocab_size=vocab, input_dim=80, d_model=256, head_num=4,
                     ffn_dim=2048, num_encoder_layers=12, num_decoder_layers=6,
                     kernel_size=15, ctc_weight=ctc_weight, dtype=jnp.bfloat16,
                     int8_ffn=int8, attention_dropout_rate=attn_dropout)
    frame_len, frame_shift = 400, 160
    n_frames = 1027
    wav_len = n_frames * frame_shift + frame_len
    true_len = seconds * SR
    rng = np.random.default_rng(0)
    wavs = np.zeros((batch_size, wav_len), np.float32)
    wavs[:, :true_len] = rng.standard_normal((batch_size, true_len)).astype(np.float32) * 0.1
    labels = rng.integers(1, vocab - 1, (batch_size, label_len)).astype(np.int32)
    ys_in, ys_out = add_sos_eos(labels, vocab - 1, vocab - 1)
    batch = {
        "wavs": jnp.asarray(wavs),
        "wav_lens": jnp.full((batch_size,), true_len, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lens": jnp.full((batch_size,), label_len, jnp.int32),
        "ys_in": jnp.asarray(ys_in.astype(np.int32)),
        "ys_out": jnp.asarray(ys_out.astype(np.int32)),
        "ys_lens": jnp.full((batch_size,), label_len + 1, jnp.int32),
    }

    def feats_fn(wavs, wav_lens, key):
        k_dither, k_aug = jax.random.split(key)
        f = kaldi_fbank(wavs, num_mel_bins=80, dither=0.1, rng_key=k_dither)
        fl = (1 + (wav_lens - frame_len) // frame_shift).astype(jnp.int32)
        return spec_augment(k_aug, f), fl

    def loss_fn(params, batch, key):
        k_feat, k_drop = jax.random.split(key)
        if features:
            feats, feat_lens = feats_fn(batch["wavs"], batch["wav_lens"], k_feat)
        else:
            feats = batch["wavs"][:, : (n_frames + 1) * 80].reshape(
                batch_size, n_frames + 1, 80)
            feat_lens = jnp.full((batch_size,), n_frames + 1, jnp.int32)
        loss, metrics = model.apply(
            {"params": params}, dict(batch, feats=feats, feat_lens=feat_lens),
            deterministic=not dropout, rngs={"dropout": k_drop})
        return loss, metrics

    def step(state, batch):
        key = jax.random.fold_in(as_dropout_key(state.dropout_rng), state.step)
        if forward_only:
            loss, _ = loss_fn(state.params, batch, key)
            return state.replace(step=state.step + 1), loss
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        grads, gnorm = clip_by_global_norm(grads, 5.0)
        if not optimizer:
            leak = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            return state.replace(step=state.step + 1), loss + 0.0 * leak
        new_state = skip_nonfinite_update(
            state, state.apply_gradients(grads=grads), loss, grads=grads)
        return new_state, loss

    params = model.init(
        jax.random.PRNGKey(0),
        {**{k: v for k, v in batch.items() if k not in ("wavs", "wav_lens")},
         "feats": jnp.zeros((batch_size, n_frames + 1, 80), jnp.float32),
         "feat_lens": jnp.full((batch_size,), n_frames + 1, jnp.int32)})["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.adamw(1e-3, weight_decay=1e-2, mu_dtype=jnp.bfloat16),
        dropout_rng=fast_dropout_rng(1))
    return step, state, batch


def slope_time(step, state, batch, n_lo=5, n_hi=25, reps=6):
    import jax
    import bench

    jstep = jax.jit(step)
    compiled = jstep.lower(state, batch).compile()
    flops = bench._flops_of(compiled)
    for _ in range(3):
        _, loss = compiled(state, batch)
    float(loss)

    def chain(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s, loss = compiled(s, batch)
        float(loss)
        return time.perf_counter() - t0

    t_lo = min(chain(n_lo) for _ in range(reps))
    t_hi = min(chain(n_hi) for _ in range(reps))
    per_step = (t_hi - t_lo) / (n_hi - n_lo)
    peak = bench._peak_flops(jax.devices()[0])
    return per_step, flops, peak


VARIANTS = {
    # name: build kwargs
    "full_bf16": {},
    "attn_dropout_0p1": {"attn_dropout": 0.1},  # pre-round-4 parity bug
    "full_int8": {"int8": True},
    "fwd_only_bf16": {"forward_only": True},
    "fwd_only_int8": {"forward_only": True, "int8": True},
    "no_dropout": {"dropout": False},
    "no_dropout_int8": {"dropout": False, "int8": True},
    "ctc_only": {"ctc_weight": 1.0},
    "att_only": {"ctc_weight": 0.0},
    "no_optimizer": {"optimizer": False},
    "no_features": {"features": False},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        step, state, batch = build(**VARIANTS[name])
        dt, flops, peak = slope_time(step, state, batch)
        row = {"ms": round(dt * 1e3, 2)}
        if flops and peak:
            row["mfu"] = round(100 * flops / dt / peak, 2)
            row["tflops_per_step"] = round(flops / 1e12, 3)
        results[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
