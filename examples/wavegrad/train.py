"""WaveGrad LJSpeech training on TPU.

Counterpart of reference ``examples/wavegrad/train.py:91`` +
``dataset.py:10`` (``diffuse``): the host crops random mel/audio windows;
the q-sample (noise-level interpolation) and the L1 noise-prediction loss
run inside the jitted sharded step with explicit PRNG keys.

Usage: python train.py [--train.max_steps 10]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from mindaudio_tpu.models.wavegrad import (
    WaveGrad,
    WaveGradWithLoss,
    default_noise_schedule,
    diffuse,
)
from mindaudio_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         put_global_batch)
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


def crop_iterator(cfg, batch_size, epochs, seed=0, rank=0, world_size=1):
    """Random (mel crop, audio crop) batches (reference dataset.py:21)."""
    feature_dir = cfg.data.feature_dir
    with open(os.path.join(feature_dir, "train.txt"), encoding="utf-8") as f:
        utts = [line.strip() for line in f if line.strip()]
    crop = int(cfg.data.crop_frames)
    hop = int(cfg.data.hop_length)
    # with 256 random crops per step the npy reads dominate host time on
    # small corpora; cache decoded features when the corpus fits in RAM
    cache = {} if bool(cfg.data.get("cache_features", False)) else None

    def load(u):
        if cache is None:
            return np.load(os.path.join(feature_dir, u + ".npy"),
                           allow_pickle=True).item()
        if u not in cache:
            cache[u] = np.load(os.path.join(feature_dir, u + ".npy"),
                               allow_pickle=True).item()
        return cache[u]
    for epoch in range(epochs):
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(len(utts))
        sel = order[: (len(order) // batch_size) * batch_size].reshape(-1, batch_size)
        # multi-process DP: identical batch sequence on all ranks, each rank
        # loads its contiguous 1/world_size row block (the global batch is
        # assembled by parallel.mesh.put_global_batch)
        for batch_idx in sel:
            if world_size > 1:
                local = batch_size // world_size
                batch_idx = batch_idx[rank * local:(rank + 1) * local]
            mel = np.zeros((len(batch_idx), crop, int(cfg.data.n_mels)), np.float32)
            audio = np.zeros((len(batch_idx), crop * hop), np.float32)
            for i, u in enumerate(batch_idx):
                d = load(utts[u])
                t = d["mel"].shape[0]
                if t <= crop:
                    mel[i, :t] = d["mel"]
                    audio[i, : t * hop] = d["audio"][: t * hop]
                else:
                    off = rng.integers(0, t - crop + 1)
                    mel[i] = d["mel"][off: off + crop]
                    audio[i] = d["audio"][off * hop: (off + crop) * hop]
            yield epoch, {"mel": mel, "audio": audio}


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "wavegrad.yaml"))
    logger = get_logger("wavegrad")
    initialize_distributed()
    mesh = make_mesh(data=jax.device_count())
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    net = WaveGradWithLoss(model=WaveGrad())
    betas = default_noise_schedule(
        int(cfg.diffusion.num_steps), float(cfg.diffusion.beta_start),
        float(cfg.diffusion.beta_end),
    )
    noise_levels = jnp.asarray(
        np.sqrt(np.cumprod(1.0 - betas)), jnp.float32
    )

    n_data = mesh.shape["data"]
    batch_size = max(n_data, int(cfg.data.batch_size) // n_data * n_data)
    it = crop_iterator(cfg, batch_size, int(cfg.optim.epochs),
                       rank=jax.process_index(), world_size=jax.process_count())
    epoch, first = next(it)

    def loss_fn(params, batch, rng):
        k_s, k_noise = jax.random.split(rng)
        s = jax.random.randint(k_s, (), 1, noise_levels.shape[0])
        noisy, noise, scale = diffuse(
            k_noise, batch["audio"], (noise_levels[s], noise_levels[s - 1])
        )
        return net.apply({"params": params}, batch["mel"], noisy, scale, noise)

    rng = jax.random.PRNGKey(0)
    k_s, k_noise = jax.random.split(rng)
    s0 = 500
    noisy, noise, scale = diffuse(
        k_noise, jnp.asarray(first["audio"]),
        (noise_levels[s0], noise_levels[s0 - 1]),
    )
    params = net.init(rng, jnp.asarray(first["mel"]), noisy, scale, noise)["params"]
    # short linear warmup tames adam's first steps (the FiLM-modulated UBlock
    # stack is sharp at init; a full-size step can 30x the loss before
    # recovering)
    warmup = int(cfg.optim.get("warmup_steps", 1000))
    schedule = optax.linear_schedule(0.0, float(cfg.optim.lr), warmup)
    tx = optax.adam(schedule)
    state = TrainState.create(apply_fn=net.apply, params=params, tx=tx,
                              dropout_rng=fast_dropout_rng(3))
    state = jax.device_put(state, repl)

    def step(state, batch):
        rng = jax.random.fold_in(as_dropout_key(state.dropout_rng), state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
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
            logger.info("epoch %d step %d loss %.5f %.2f s/step",
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
