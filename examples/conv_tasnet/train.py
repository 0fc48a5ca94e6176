"""Conv-TasNet LibriMix training on TPU.

Counterpart of reference ``examples/conv_tasnet/train.py``: PIT SI-SNR over
the general vmapped permutation search (loss/separation_loss.py) instead of
the reference's hard-coded 2-speaker one-hot matmuls and fixed mask lengths
(reference separation_loss.py:104-109, 262-274). One jitted sharded step.

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

from mindaudio_tpu.data.librimix import separation_batch_iterator
from mindaudio_tpu.loss.separation_loss import pit_si_snr_loss
from mindaudio_tpu.models.conv_tasnet import ConvTasNet
from mindaudio_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         put_global_batch)
from mindaudio_tpu.train.checkpoint import CheckpointManager
from mindaudio_tpu.train.config import get_config
from mindaudio_tpu.train.log import get_logger
from mindaudio_tpu.train.state import (
    TrainState,
    clip_by_global_norm,
    skip_nonfinite_update,
)


def build_model(cfg):
    return ConvTasNet(
        enc_dim=int(cfg.model.enc_dim), win_len=int(cfg.model.win_len),
        bottleneck=int(cfg.model.bottleneck), hidden=int(cfg.model.hidden),
        kernel_size=int(cfg.model.kernel_size),
        num_blocks=int(cfg.model.num_blocks),
        num_repeats=int(cfg.model.num_repeats),
        num_spk=int(cfg.model.num_spk), norm_type=str(cfg.model.norm_type),
        mask_nonlinear=str(cfg.model.mask_nonlinear),
    )


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "conv_tasnet.yaml"))
    logger = get_logger("conv_tasnet")
    initialize_distributed()
    mesh = make_mesh(data=jax.device_count())
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    model = build_model(cfg)
    seg = int(float(cfg.data.segment_seconds) * int(cfg.data.sample_rate))
    n_data = mesh.shape["data"]
    batch_size = max(n_data, int(cfg.data.batch_size) // n_data * n_data)

    it = separation_batch_iterator(
        cfg.data.train_dir, batch_size, seg, epochs=int(cfg.optim.epochs),
        rank=jax.process_index(), world_size=jax.process_count(),
    )
    epoch, first = next(it)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(first["mix"]))["params"]
    tx = optax.adam(float(cfg.optim.lr))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    state = jax.device_put(state, repl)

    def loss_fn(params, batch):
        est = model.apply({"params": params}, batch["mix"])
        loss, _ = pit_si_snr_loss(est, batch["src"], batch["lengths"])
        return loss

    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        grads, gnorm = clip_by_global_norm(grads, cfg.optim.grad_clip)
        new_state = skip_nonfinite_update(
            state, state.apply_gradients(grads=grads), loss, grads=grads
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

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
            logger.info("epoch %d step %d -si_snr %.3f %.2f s/step",
                        epoch, step_count, float(metrics["loss"]),
                        (time.time() - t0) / step_count)
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
