"""Slope-time the flagship train step: is 34.6 ms/step real device time or
does it include per-call tunnel dispatch? Times the SAME compiled step at two
chain lengths; slope = true per-step device time."""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import bench

def run():
    import jax, jax.numpy as jnp, optax
    from mindaudio_tpu.models.asr_model import ASRModel
    from mindaudio_tpu.ops.spectral import kaldi_fbank
    from mindaudio_tpu.ops.specaugment import spec_augment
    from mindaudio_tpu.train.state import (TrainState, as_dropout_key,
        clip_by_global_norm, fast_dropout_rng, skip_nonfinite_update)
    from mindaudio_tpu.utils.common import add_sos_eos

    batch_size, seconds, label_len, vocab = 32, 10, 20, 4233
    model = ASRModel(vocab_size=vocab, input_dim=80, d_model=256, head_num=4,
                     ffn_dim=2048, num_encoder_layers=12, num_decoder_layers=6,
                     kernel_size=15, ctc_weight=0.3, dtype=jnp.bfloat16)
    frame_len, frame_shift = 400, 160
    n_frames = 1027
    wav_len = n_frames * frame_shift + frame_len
    true_len = seconds * 16000
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

    def features(wavs, wav_lens, key):
        k_dither, k_aug = jax.random.split(key)
        feats = kaldi_fbank(wavs, num_mel_bins=80, dither=0.1, rng_key=k_dither)
        feat_lens = (1 + (wav_lens - frame_len) // frame_shift).astype(jnp.int32)
        feats = spec_augment(k_aug, feats)
        return feats, feat_lens

    def loss_fn(params, batch, key):
        k_feat, k_drop = jax.random.split(key)
        feats, feat_lens = features(batch["wavs"], batch["wav_lens"], k_feat)
        loss, metrics = model.apply(
            {"params": params}, dict(batch, feats=feats, feat_lens=feat_lens),
            deterministic=False, rngs={"dropout": k_drop})
        return loss, metrics

    def step(state, batch):
        key = jax.random.fold_in(as_dropout_key(state.dropout_rng), state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        grads, gnorm = clip_by_global_norm(grads, 5.0)
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

    jstep = jax.jit(step)  # no donation: state reused across chains
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

    n_lo, n_hi = 5, 25
    t_lo = min(chain(n_lo) for _ in range(4))
    t_hi = min(chain(n_hi) for _ in range(4))
    per_step = (t_hi - t_lo) / (n_hi - n_lo)
    naive = t_hi / n_hi
    peak = bench._peak_flops(jax.devices()[0])
    print(json.dumps({
        "per_step_ms_slope": round(per_step * 1e3, 2),
        "per_step_ms_naive": round(naive * 1e3, 2),
        "mfu_slope": round(100 * flops / per_step / peak, 2),
        "mfu_naive": round(100 * flops / naive / peak, 2),
        "flops": flops,
    }))

run()
