"""FastSpeech2 LJSpeech training on TPU.

Counterpart of reference ``examples/fastspeech2/train.py:146``
(``MyTrainOneStepCell`` :51): one jitted sharded step over the
FastSpeech2WithLoss module (multi-term masked loss inside the graph),
exponential-decay LR, clip-by-global-norm.

Usage: python train.py [--train.max_steps 10]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.models.fastspeech2 import FastSpeech2, FastSpeech2WithLoss
from mindaudio_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         put_global_batch)
from mindaudio_tpu.scheduler.schedules import exponential_decay_lr
from mindaudio_tpu.train.checkpoint import CheckpointManager
from mindaudio_tpu.train.config import get_config
from mindaudio_tpu.train.log import get_logger
from mindaudio_tpu.train.state import (
    TrainState,
    as_dropout_key,
    clip_by_global_norm,
    fast_dropout_rng,
    skip_nonfinite_update,
)

from dataset import batch_iterator
from text import vocab_size


def build_model(cfg):
    fs2 = FastSpeech2(
        vocab_size=vocab_size(),
        d_model=int(cfg.model.d_model),
        head_num=int(cfg.model.head_num),
        conv_filter=int(cfg.model.conv_filter),
        encoder_layers=int(cfg.model.encoder_layers),
        decoder_layers=int(cfg.model.decoder_layers),
        dropout_rate=float(cfg.model.dropout_rate),
        n_mels=int(cfg.data.n_mels),
        max_seq_len=max(int(cfg.data.max_mel_len), int(cfg.data.max_phoneme_len)),
    )
    return fs2, FastSpeech2WithLoss(model=fs2)


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "fastspeech2.yaml"))
    logger = get_logger("fastspeech2")
    initialize_distributed()
    mesh = make_mesh(data=jax.device_count())
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    _, net = build_model(cfg)
    n_data = mesh.shape["data"]
    batch_size = max(n_data, int(cfg.data.batch_size) // n_data * n_data)

    it = batch_iterator(
        cfg.data.feature_dir, batch_size,
        int(cfg.data.max_phoneme_len), int(cfg.data.max_mel_len),
        epochs=int(cfg.optim.epochs),
        rank=jax.process_index(), world_size=jax.process_count(),
    )
    epoch, first = next(it)

    def apply_loss(params, batch, rng):
        total, mel_l, dur_l, p_l, e_l = net.apply(
            {"params": params}, batch["phonemes"], batch["src_lens"],
            batch["mel"], batch["pitch"], batch["energy"], batch["duration"],
            deterministic=False, rngs={"dropout": rng},
        )
        return total, {"mel": mel_l, "dur": dur_l, "pitch": p_l, "energy": e_l}

    params = net.init(
        jax.random.PRNGKey(0), jnp.asarray(first["phonemes"]),
        jnp.asarray(first["src_lens"]), jnp.asarray(first["mel"]),
        jnp.asarray(first["pitch"]), jnp.asarray(first["energy"]),
        jnp.asarray(first["duration"]),
    )["params"]
    # warmup is REQUIRED for the post-LN FFT stacks — without it Adam@1e-3
    # collapses the encoder to input-independence (see scheduler docstring)
    schedule = exponential_decay_lr(
        float(cfg.optim.lr), float(cfg.optim.decay_rate),
        int(cfg.optim.decay_steps),
        warmup_steps=int(cfg.optim.get("warmup_steps", 1000)),
    )
    tx = optax.adam(schedule)
    state = TrainState.create(apply_fn=net.apply, params=params, tx=tx,
                              dropout_rng=fast_dropout_rng(7))
    state = jax.device_put(state, repl)

    def step(state, batch):
        rng = jax.random.fold_in(as_dropout_key(state.dropout_rng), state.step)
        (loss, aux), grads = jax.value_and_grad(apply_loss, has_aux=True)(
            state.params, batch, rng
        )
        grads, gnorm = clip_by_global_norm(grads, cfg.optim.grad_clip)
        new_state = skip_nonfinite_update(
            state, state.apply_gradients(grads=grads), loss, grads=grads
        )
        return new_state, dict(aux, loss=loss, grad_norm=gnorm)

    step_fn = jax.jit(step, in_shardings=(repl, data_sh),
                      out_shardings=(repl, repl), donate_argnums=(0,))

    ckpt = CheckpointManager(cfg.train.ckpt_dir,
                             keep_max=int(cfg.train.keep_checkpoint_max))
    max_steps = int(cfg.train.max_steps)
    t0 = time.time()
    step_count = 0

    def run(state, batch):
        dev = put_global_batch(data_sh, batch)
        return step_fn(state, dev)

    from mindaudio_tpu.train.prefetch import prefetch

    state, metrics = run(state, first)
    step_count += 1
    # collate/augment + H2D for batch N+1 overlap step N on device
    for epoch, batch in prefetch(
            it, size=2,
            transform=lambda eb: (eb[0], put_global_batch(data_sh, eb[1]))):
        state, metrics = step_fn(state, batch)
        step_count += 1
        if step_count % int(cfg.train.log_every_steps) == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                "epoch %d step %d loss %.4f (mel %.4f dur %.4f pitch %.4f "
                "energy %.4f) gnorm %.2f %.2f s/step",
                epoch, step_count, m["loss"], m["mel"], m["dur"], m["pitch"],
                m["energy"], m.get("grad_norm", float("nan")),
                (time.time() - t0) / step_count,
            )
        if step_count % int(cfg.train.save_every_steps) == 0:
            # all ranks call save (orbax is a global collective; primary writes)
            ckpt.save(jax.device_get({"params": state.params}), step_count)
        if max_steps and step_count >= max_steps:
            break

    # all ranks call save (orbax is a global collective; primary writes)
    ckpt.save(jax.device_get({"params": state.params}), step_count)
    logger.info("done: %d steps", step_count)


if __name__ == "__main__":
    main()
