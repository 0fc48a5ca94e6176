"""Train-step timings for the non-flagship model families (PERF.md).

Run on a real chip: python benchmarks/model_zoo_steps.py [name ...]
"""
import sys, time, json, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp, optax


def timeit(jstep, state, batch, iters=10):
    # no donate_argnums: donating the multi-GB DS2 train state reproducibly
    # crashes the remote-tunnel TPU worker after ~10-30 executions (buffer
    # aliasing bug in the tunnel backend; without donation the same program
    # runs indefinitely). Donation only affects peak memory, not step time,
    # so the benchmark numbers are unchanged.
    compiled = jax.jit(jstep).lower(state, batch).compile()
    for _ in range(3):
        state, loss = compiled(state, batch)
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = compiled(state, batch)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, float(loss)


def make_state(params, extra=None):
    from mindaudio_tpu.train.state import TrainState

    tx = optax.adamw(1e-3)
    return TrainState.create(apply_fn=None, params=params, tx=tx,
                             batch_stats=extra)


def bench_deepspeech2():
    from mindaudio_tpu.models.deepspeech2 import DeepSpeechModel
    from mindaudio_tpu.loss.ctc_loss import ctc_loss

    B, T, F, V = 16, 1250, 161, 29  # the recipe's fixed train pad
    # bf16 = the TPU counterpart of the reference's fp16 loss-scale mode
    model = DeepSpeechModel(vocab_size=V, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    spect = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(1, V, (B, 40)).astype(np.int32))
    label_lens = jnp.full((B,), 40, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), spect, lens)
    state = make_state(variables["params"], variables.get("batch_stats"))

    def step(state, batch):
        def loss_fn(p):
            (logits, out_lens), upd = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch["spect"], batch["lens"], deterministic=False,
                mutable=["batch_stats"])
            return ctc_loss(logits, out_lens, batch["labels"],
                            batch["label_lens"]), upd["batch_stats"]
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads).replace(batch_stats=bs), loss

    batch = {"spect": spect, "lens": lens, "labels": labels,
             "label_lens": label_lens}
    ms, loss = timeit(step, state, batch)
    audio_s = B * T * 0.01  # 10 ms hop
    return {"step_ms": round(ms, 1), "x_realtime": round(audio_s / (ms / 1e3), 0)}


def bench_conv_tasnet():
    from mindaudio_tpu.models.conv_tasnet import ConvTasNet
    from mindaudio_tpu.loss.separation_loss import pit_si_snr_loss

    B, T = 8, 4 * 8000  # 4 s @ 8 kHz, reference LibriMix config
    model = ConvTasNet()
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mix)["params"]
    state = make_state(params)

    def step(state, batch):
        def loss_fn(p):
            est = model.apply({"params": p}, batch["mix"])
            loss, _perm = pit_si_snr_loss(est, batch["src"])
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    ms, loss = timeit(step, state, {"mix": mix, "src": src})
    audio_s = B * 4
    return {"step_ms": round(ms, 1), "x_realtime": round(audio_s / (ms / 1e3), 0)}


def bench_fastspeech2():
    from mindaudio_tpu.models.fastspeech2 import FastSpeech2, FastSpeech2WithLoss

    B, L, M, NM = 32, 128, 800, 80  # reference config: batch 32, 128 mels cap
    fs2 = FastSpeech2(vocab_size=120, n_mels=NM, max_seq_len=max(L, M))
    net = FastSpeech2WithLoss(model=fs2)
    rng = np.random.default_rng(0)
    dur = np.full((B, L), M // L, np.int32)
    batch = {
        "phonemes": jnp.asarray(rng.integers(1, 120, (B, L)).astype(np.int32)),
        "src_lens": jnp.full((B,), L, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, M, NM)), jnp.float32),
        "pitch": jnp.asarray(rng.standard_normal((B, L)), jnp.float32),
        "energy": jnp.asarray(rng.standard_normal((B, L)), jnp.float32),
        "duration": jnp.asarray(dur),
    }
    args = (batch["phonemes"], batch["src_lens"], batch["mel"],
            batch["pitch"], batch["energy"], batch["duration"])
    params = net.init(jax.random.PRNGKey(0), *args)["params"]
    state = make_state(params)

    def step(state, batch):
        def loss_fn(p):
            total, *_ = net.apply(
                {"params": p}, batch["phonemes"], batch["src_lens"],
                batch["mel"], batch["pitch"], batch["energy"],
                batch["duration"], deterministic=False,
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0),
                                                    state.step)})
            return total
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    ms, loss = timeit(step, state, batch)
    return {"step_ms": round(ms, 1), "mel_frames_per_sec": round(B * M / (ms / 1e3), 0)}


def bench_moe_conformer():
    """MoE-Conformer encoder (parallel/moe.py wired via moe_experts): 4
    experts, top-2 routing — ~2x the dense FFN's active FLOPs with 4x the
    FFN capacity. Single-chip (EP sharding needs a mesh; the routing math
    is identical)."""
    from mindaudio_tpu.models.conformer import ConformerEncoder

    B, T, F = 16, 1003, 80  # ~10 s of fbank frames -> t_sub ~250
    enc = ConformerEncoder(input_dim=F, d_model=256, head_num=4,
                           ffn_dim=2048, num_layers=12, dropout_rate=0.1,
                           moe_experts=4, moe_top_k=2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), xs, lens)
    state = make_state(variables["params"])
    batch = {"xs": xs, "lens": lens}

    def step(state, batch):
        def loss_fn(p):
            out, mask = enc.apply(
                {"params": p}, batch["xs"], batch["lens"],
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(0),
                                                    state.step)})
            return (jnp.square(out.astype(jnp.float32))
                    * mask[:, 0, :, None]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    ms, loss = timeit(step, state, batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    t_sub = (T - 3) // 4
    return {"step_ms": round(ms, 1),
            "params_m": round(n_params / 1e6, 1),
            "tokens_per_sec": round(B * t_sub / (ms / 1e3), 0)}


if __name__ == "__main__":
    names = sys.argv[1:] or ["deepspeech2", "conv_tasnet", "fastspeech2"]
    out = {}
    for n in names:
        try:
            out[n] = globals()[f"bench_{n}"]()
        except Exception as e:  # report and continue
            out[n] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(n, out[n], flush=True)
    print(json.dumps(out))
