"""Conformer AISHELL-1 training on TPU.

TPU-native counterpart of reference ``examples/conformer/train.py:53``: the
whole step — kaldi fbank, SpecAugment, CMVN, encoder/decoder forward, hybrid
loss, backward, clip, update — is ONE jitted XLA program per length bucket,
sharded batch-over-``data`` (and optionally Megatron TP over ``model``) on a
mesh. Feature extraction runs on device (the reference burns host CPU in an
mp.Pool per batch, dataset.py:456-492); gradient all-reduce is GSPMD's psum,
not a DistributedGradReducer.

Usage:
    python train.py --config conformer.yaml [--optim.epochs 1] ...
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

from mindaudio_tpu.models.asr_model import ASRModel
from mindaudio_tpu.ops.spectral import kaldi_fbank
from mindaudio_tpu.ops.specaugment import spec_augment
from mindaudio_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                         put_global_batch)
from mindaudio_tpu.parallel.shardings import state_shardings
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
from mindaudio_tpu.scheduler.schedules import asr_warmup_lr
from mindaudio_tpu.utils.cmvn import load_cmvn
from mindaudio_tpu.utils.tokenizer import CharTokenizer

from dataset import FRAME_LEN, FRAME_SHIFT, batch_iterator, read_manifest


def build_tokenizer(cfg):
    vocab_file = cfg.data.vocab_file
    if os.path.exists(vocab_file):
        return CharTokenizer.from_file(vocab_file)
    utts = read_manifest(cfg.data.train_csv)
    tok = CharTokenizer.from_transcripts(u.text for u in utts)
    os.makedirs(os.path.dirname(vocab_file) or ".", exist_ok=True)
    tok.save(vocab_file)
    return tok


def build_model(cfg, vocab_size, mesh=None, training=True):
    """Build the ASRModel from the config.

    ``mesh`` enables the parallelism the config asks for: MoE experts ride
    the ``model`` axis (EP), ``train.pipeline_stages > 1`` streams the
    encoder blocks over the ``pipe`` axis (GPipe). ``training=False``
    (predict.py) keeps MoE routing (the checkpoint's param tree needs it)
    but drops the pipeline — decode batches are too small to fill a pipe.
    """
    cmvn_mean = cmvn_istd = None
    if os.path.exists(cfg.data.cmvn_file):
        mean, istd = load_cmvn(cfg.data.cmvn_file)
        cmvn_mean, cmvn_istd = jnp.asarray(mean), jnp.asarray(istd)
    moe_experts = int(cfg.model.get("moe_experts", 0))
    pipe_stages = int(cfg.train.get("pipeline_stages", 1)) if training else 1
    return ASRModel(
        vocab_size=vocab_size,
        input_dim=cfg.model.input_dim,
        d_model=cfg.model.d_model,
        head_num=cfg.model.head_num,
        ffn_dim=cfg.model.ffn_dim,
        num_encoder_layers=cfg.model.num_encoder_layers,
        num_decoder_layers=cfg.model.num_decoder_layers,
        dropout_rate=cfg.model.dropout_rate,
        attention_dropout_rate=float(
            cfg.model.get("attention_dropout_rate", 0.0)),
        kernel_size=cfg.model.kernel_size,
        ctc_weight=cfg.model.ctc_weight,
        lsm_weight=cfg.model.lsm_weight,
        use_dynamic_chunk=bool(cfg.model.get("use_dynamic_chunk", False)),
        causal_conv=bool(cfg.model.get("causal_conv", False)),
        cmvn_mean=cmvn_mean,
        cmvn_istd=cmvn_istd,
        remat=bool(cfg.model.get("remat", False)),
        int8_ffn=bool(cfg.model.get("int8_ffn", False)),
        moe_experts=moe_experts,
        moe_top_k=int(cfg.model.get("moe_top_k", 2)),
        moe_capacity_factor=float(cfg.model.get("moe_capacity_factor", 1.25)),
        moe_mesh=(mesh if moe_experts > 0 and mesh is not None
                  and mesh.shape.get("model", 1) > 1 else None),
        pipeline_mesh=(mesh if pipe_stages > 1 and mesh is not None
                       and mesh.shape.get("pipe", 1) > 1 else None),
        pipeline_microbatches=int(cfg.train.get("pipeline_microbatches", 4)),
        dtype=jnp.bfloat16 if cfg.optim.bf16 else jnp.float32,
    )


def device_features(cfg, wavs, wav_lens, rng, train=True):
    """On-device fbank (+dither, +SpecAugment) — the jitted hot path."""
    k_dither, k_aug = jax.random.split(rng)
    feats = kaldi_fbank(
        wavs,
        num_mel_bins=cfg.features.num_mel_bins,
        frame_length_ms=cfg.features.frame_length_ms,
        frame_shift_ms=cfg.features.frame_shift_ms,
        dither=cfg.features.dither if train else 0.0,
        rng_key=k_dither if train else None,
    )
    feat_lens = 1 + (wav_lens - FRAME_LEN) // FRAME_SHIFT
    if train and cfg.features.spec_aug:
        feats = spec_augment(
            k_aug, feats,
            num_t_mask=cfg.features.num_t_mask,
            num_f_mask=cfg.features.num_f_mask,
            max_t=cfg.features.max_t, max_f=cfg.features.max_f,
        )
    return feats, feat_lens.astype(jnp.int32)


def make_step(cfg, model, mesh, st_sh):
    use_moe = int(cfg.model.get("moe_experts", 0)) > 0
    moe_aux_w = float(cfg.model.get("moe_aux_weight", 0.01))

    def loss_fn(params, batch, rng):
        k_feat, k_drop, k_chunk = jax.random.split(rng, 3)
        feats, feat_lens = device_features(
            cfg, batch["wavs"], batch["wav_lens"], k_feat, train=True
        )
        model_batch = dict(batch, feats=feats, feat_lens=feat_lens)
        if use_moe:
            # routers sow their Switch load-balance losses; pull and add
            (loss, metrics), inter = model.apply(
                {"params": params}, model_batch, deterministic=False,
                chunk_rng=k_chunk, rngs={"dropout": k_drop},
                mutable=["intermediates"],
            )
            aux_leaves = [
                jnp.asarray(v).mean() for path, v in
                jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
                if "moe_aux_loss" in "/".join(
                    str(getattr(p, "key", p)) for p in path)
            ]
            if aux_leaves:
                moe_aux = sum(aux_leaves) / len(aux_leaves)
                loss = loss + moe_aux_w * moe_aux
                metrics = dict(metrics, moe_aux=moe_aux)
        else:
            loss, metrics = model.apply(
                {"params": params}, model_batch, deterministic=False,
                chunk_rng=k_chunk, rngs={"dropout": k_drop},
            )
        return loss, metrics

    def step(state, batch):
        rng = jax.random.fold_in(as_dropout_key(state.dropout_rng), state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        grads, gnorm = clip_by_global_norm(grads, cfg.optim.grad_clip)
        new_state = skip_nonfinite_update(
            state, state.apply_gradients(grads=grads), loss, grads=grads
        )
        return new_state, dict(metrics, loss=loss, grad_norm=gnorm)

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def eval_step(params, batch):
        feats, feat_lens = device_features(
            cfg, batch["wavs"], batch["wav_lens"],
            jax.random.PRNGKey(0), train=False,
        )
        loss, _ = model.apply(
            {"params": params}, dict(batch, feats=feats, feat_lens=feat_lens),
            deterministic=True,
        )
        return loss

    eval_fn = jax.jit(eval_step, in_shardings=(st_sh.params, data_sh),
                      out_shardings=repl)
    train_fn = jax.jit(
        step,
        in_shardings=(st_sh, data_sh),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    )
    return train_fn, eval_fn, data_sh


def main():
    cfg = get_config(os.path.join(os.path.dirname(__file__), "conformer.yaml"))
    logger = get_logger("conformer")
    initialize_distributed()

    model_axis = int(cfg.train.mesh_model_axis)
    pipe_axis = int(cfg.train.get("pipeline_stages", 1))
    mesh = make_mesh(data=jax.device_count() // (model_axis * pipe_axis),
                     model=model_axis, pipe=pipe_axis)
    logger.info("mesh: %s", mesh)
    # with the pipeline on, every batch must split into whole microbatches
    batch_multiple = mesh.shape["data"] * (
        int(cfg.train.get("pipeline_microbatches", 4)) if pipe_axis > 1 else 1)

    tokenizer = build_tokenizer(cfg)
    logger.info("vocab: %d", tokenizer.vocab_size)
    model = build_model(cfg, tokenizer.vocab_size, mesh=mesh)

    # init on the smallest bucket shape
    it = batch_iterator(
        cfg.data.train_csv, tokenizer, epochs=int(cfg.optim.epochs),
        rank=jax.process_index(), world_size=jax.process_count(),
        speed_perturb=bool(cfg.data.speed_perturb),
        batch_factor=float(cfg.data.batch_factor),
        batch_multiple=batch_multiple,
        max_label_len=int(cfg.data.max_label_len),
        frame_bucket_limit=cfg.data.get("frame_bucket_limit"),
        batch_bucket_limit=cfg.data.get("batch_bucket_limit"),
    )
    epoch, frames, first = next(it)
    rng = jax.random.PRNGKey(0)
    feats, feat_lens = device_features(
        cfg, jnp.asarray(first["wavs"]), jnp.asarray(first["wav_lens"]),
        rng, train=False,
    )
    init_batch = {k: jnp.asarray(v) for k, v in first.items()}
    init_batch.update(feats=feats, feat_lens=feat_lens)

    schedule = asr_warmup_lr(cfg.optim.lr, cfg.optim.warmup_steps)
    # bf16 first moment halves AdamW's mu HBM traffic (~2 ms of the step is
    # optimizer elementwise over 3x43M f32 leaves — PERF.md ablation); the
    # second moment and params stay f32 for update precision
    mu_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(cfg.optim.get("mu_dtype", "bfloat16"))]
    tx = optax.adamw(schedule, weight_decay=cfg.optim.weight_decay,
                     mu_dtype=mu_dtype)

    # resume: restore params/opt_state/step from the latest checkpoint
    # (reference ResumeCallback + start_steps LR offset, callback.py:450,
    # examples/conformer/train.py:118-133 — the step count lives in the state
    # so the Noam schedule resumes at the right point automatically).
    # Restoring targets an ABSTRACT (eval_shape) state: no throwaway 46M-param
    # device init just to be overwritten — restarts are disk-bound, not
    # compile/init-bound.
    from mindaudio_tpu.train.checkpoint import list_steps, restore_checkpoint

    resume_step = (list_steps(cfg.train.ckpt_dir)
                   if bool(cfg.train.get("resume", False)) else [])
    if resume_step:
        logger.info("restoring from %s (step %d)", cfg.train.ckpt_dir,
                    resume_step[-1])
        abstract = jax.eval_shape(
            lambda: model.init(rng, init_batch, chunk_rng=rng))["params"]
        target = {
            "params": abstract,
            "opt_state": jax.eval_shape(tx.init, abstract),
            "step": jax.ShapeDtypeStruct((), jnp.int32),
        }
        # numpy leaves → orbax restores to HOST arrays; the single
        # host→device upload happens at the sharded device_put below
        # (abstract jax targets would restore straight to the default
        # device and then device_put again — 2x the transfer)
        target = jax.tree_util.tree_map(
            lambda l: np.zeros(l.shape, l.dtype), target)
        restored = restore_checkpoint(cfg.train.ckpt_dir, target=target)
        params = restored["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=tx,
            dropout_rng=fast_dropout_rng(42),
        )
        state = state.replace(opt_state=restored["opt_state"],
                              step=jnp.asarray(restored["step"], jnp.int32))
        logger.info("resumed from step %d", int(state.step))
    else:
        params = model.init(rng, init_batch, chunk_rng=rng)["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=tx,
            dropout_rng=fast_dropout_rng(42),
        )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    logger.info("params: %.1fM", n_params / 1e6)

    st_sh = state_shardings(
        state, mesh, zero1=bool(cfg.train.get("zero1_optimizer", False)))
    state = jax.device_put(state, st_sh)
    step_fn, eval_fn, data_sh = make_step(cfg, model, mesh, st_sh)

    def eval_loss(state, max_batches=20):
        """Mean dev loss over a bounded batch sample (EvalCallback parity:
        checkpoint selection for top-N averaging, reference callback.py:256)."""
        total, n = 0.0, 0
        for _, frames, batch in batch_iterator(
            cfg.data.dev_csv, tokenizer, epochs=1, speed_perturb=False,
            rank=jax.process_index(), world_size=jax.process_count(),
            batch_multiple=batch_multiple,
            batch_factor=float(cfg.data.batch_factor),
            max_label_len=int(cfg.data.max_label_len),
            frame_bucket_limit=cfg.data.get("frame_bucket_limit"),
            batch_bucket_limit=cfg.data.get("batch_bucket_limit"),
        ):
            dev = put_global_batch(data_sh, batch)
            total += float(eval_fn(state.params, dev))
            n += 1
            if n >= max_batches:
                break
        # no full dev batch (tiny dev set vs data-axis multiple): rank last
        return total / n if n else float("inf")

    ckpt = CheckpointManager(cfg.train.ckpt_dir,
                             keep_max=int(cfg.train.keep_checkpoint_max))
    max_steps = int(cfg.train.max_steps)
    t0 = time.time()

    from mindaudio_tpu.train.prefetch import prefetch

    def to_device(item):
        epoch, frames, batch = item
        dev = put_global_batch(data_sh, batch)
        return epoch, frames, dev

    # checkpoints are named (and max_steps counted) by the GLOBAL optimizer
    # step — a resumed process must not rename/overwrite earlier steps with
    # its local counter, or the next resume restores stale params
    start_step = int(jax.device_get(state.step))
    step_count = 0
    _, _, first_dev = to_device((epoch, frames, first))
    state, metrics = step_fn(state, first_dev)
    step_count += 1
    # collate + H2D for batch N+1 overlap step N on device
    for epoch, frames, batch in prefetch(it, size=2, transform=to_device):
        state, metrics = step_fn(state, batch)
        step_count += 1
        gstep = start_step + step_count
        if step_count % int(cfg.train.log_every_steps) == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                "epoch %d step %d bucket %d loss %.4f (att %.4f ctc %.4f acc %.3f) "
                "%.2f s/step",
                epoch, gstep, frames, m["loss"], m["loss_att"],
                m["loss_ctc"], m["acc_att"], (time.time() - t0) / step_count,
            )
        if step_count % int(cfg.train.save_every_steps) == 0:
            # eval AND save run on ALL processes (both the jitted eval and
            # the orbax save are global collectives — gating either on rank 0
            # would deadlock a pod); only logging is rank-0
            dev_loss = eval_loss(state)
            if jax.process_index() == 0:
                logger.info("eval @ step %d: dev loss %.4f", gstep, dev_loss)
            ckpt.save(jax.device_get({
                "params": state.params, "opt_state": state.opt_state,
                "step": state.step,
            }), gstep, eval_metric=dev_loss)
        if max_steps and start_step + step_count >= max_steps:
            break

    # all ranks call save (orbax is a global collective; primary writes)
    ckpt.save(jax.device_get({
        "params": state.params, "opt_state": state.opt_state,
        "step": state.step,
    }), start_step + step_count)
    logger.info("done: %d steps (global %d)", step_count, start_step + step_count)


if __name__ == "__main__":
    main()
