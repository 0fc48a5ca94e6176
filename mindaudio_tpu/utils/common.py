"""Host-side batch-assembly helpers.

Ports of reference ``mindaudio/utils/common.py``: sequence padding
(common.py:10), sos/eos framing (common.py:55), CTC blank collapse
(common.py:118), log-domain addition (common.py:131), parameter grouping
(common.py:151).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "IGNORE_ID",
    "pad_sequence",
    "add_sos_eos",
    "add_blank",
    "remove_duplicates_and_blank",
    "log_add",
    "get_parameter_numel",
    "get_activation",
    "get_subsample",
    "get_feat_extract_output_lengths",
    "set_weight_decay",
]

IGNORE_ID = -1


def pad_sequence(sequences, batch_first=True, padding_value=0, max_len=None):
    """Pad a list of 1-D/2-D arrays to a common (or given) length."""
    seqs = [np.asarray(s) for s in sequences]
    if max_len is None:
        max_len = max(s.shape[0] for s in seqs)
    trailing = seqs[0].shape[1:]
    out = np.full((len(seqs), max_len) + trailing, padding_value, dtype=seqs[0].dtype)
    for i, s in enumerate(seqs):
        out[i, : s.shape[0]] = s[:max_len]
    if not batch_first:
        out = np.swapaxes(out, 0, 1)
    return out


def add_sos_eos(ys_pad, sos, eos, ignore_id=IGNORE_ID):
    """Build decoder input (``<sos> y``) and target (``y <eos>``) batches.

    ``ys_pad``: (B, L) padded with ``ignore_id``. Returns ``(ys_in, ys_out)``
    of shape (B, L + 1): ys_in pads with ``eos`` after the sequence, ys_out
    pads with ``ignore_id`` after the ``eos``.
    """
    ys_pad = np.asarray(ys_pad)
    b, length = ys_pad.shape
    ys_in = np.full((b, length + 1), eos, dtype=ys_pad.dtype)
    ys_out = np.full((b, length + 1), ignore_id, dtype=ys_pad.dtype)
    ys_in[:, 0] = sos
    for i in range(b):
        valid = ys_pad[i][ys_pad[i] != ignore_id]
        n = len(valid)
        ys_in[i, 1 : 1 + n] = valid
        ys_out[i, :n] = valid
        ys_out[i, n] = eos
    return ys_in, ys_out


def add_blank(ys_pad, blank, ignore_id=IGNORE_ID):
    """Interleave CTC blanks: ``y -> blank y1 blank y2 ...`` (for some TTS/CTC uses).

    ``ignore_id`` padding positions become ``blank`` (they must never reach
    an embedding/loss as negative indices).
    """
    ys_pad = np.asarray(ys_pad)
    b, length = ys_pad.shape
    out = np.full((b, 2 * length + 1), blank, dtype=ys_pad.dtype)
    out[:, 1::2] = np.where(ys_pad == ignore_id, blank, ys_pad)
    return out


def remove_duplicates_and_blank(hyp, blank_id=0):
    """Collapse repeats then drop blanks (CTC greedy post-process)."""
    out = []
    prev = None
    for t in hyp:
        if t != prev and t != blank_id:
            out.append(int(t))
        prev = t
    return out


def log_add(args):
    """Numerically-stable log-sum-exp over a Python list."""
    if all(a == -float("inf") for a in args):
        return -float("inf")
    a_max = max(args)
    return a_max + math.log(sum(math.exp(a - a_max) for a in args))


def get_parameter_numel(params):
    """Total parameter count of a pytree."""
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def get_activation(act):
    """Activation function by name (reference common.py:91): the JAX
    counterparts of the reference's nn.Cell activations."""
    import jax

    funcs = {
        "tanh": jax.numpy.tanh,
        "relu": jax.nn.relu,
        "swish": jax.nn.silu,
        "gelu": jax.nn.gelu,
    }
    return funcs[act]


def get_subsample(config):
    """Subsampling factor from an encoder config dict (reference
    common.py:106): ``conv2d``→4, ``conv2d6``→6, ``conv2d8``→8."""
    input_layer = config["encoder_conf"]["input_layer"]
    assert input_layer in ["conv2d", "conv2d6", "conv2d8"]
    return {"conv2d": 4, "conv2d6": 6, "conv2d8": 8}[input_layer]


def get_feat_extract_output_lengths(input_length, kernel_size, stride):
    """Sequence length after a stack of valid convs (reference
    common.py:165). Works on ints or arrays."""
    len_ds = input_length
    for k, s in zip(kernel_size, stride):
        len_ds = (len_ds - k) // s + 1
    return len_ds


def set_weight_decay(params, weight_decay=1e-2):
    """Weight-decay mask for a Flax param pytree (reference common.py:148
    groups MindSpore Parameters; the optax idiom is a boolean mask):
    ``True`` (decay) everywhere except biases and LayerNorm scales.

    Use with ``optax.add_decayed_weights(weight_decay, mask=...)`` or
    ``optax.adamw(..., mask=...)``.
    """
    import jax

    def _decay(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))).lower()
                for p in path]
        if any("bias" in k for k in keys):
            return False
        if any("norm" in k or "layernorm" in k for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(_decay, params)
