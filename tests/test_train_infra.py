"""Training-substrate unit tests: config, tokenizer, CMVN, checkpoints,
profiler — pieces the reference never tests (SURVEY §4)."""

import os

import numpy as np
import pytest


class TestConfig:
    def test_base_inheritance_and_cli(self, tmp_path):
        from mindaudio_tpu.train.config import get_config, load_config

        base = tmp_path / "base.yaml"
        base.write_text("optim:\n  lr: 0.1\n  epochs: 10\nname: base\n")
        child = tmp_path / "child.yaml"
        child.write_text(f"base_config: {base}\noptim:\n  lr: 0.2\n")

        cfg = load_config(str(child))
        assert cfg.optim.lr == 0.2          # child wins
        assert cfg.optim.epochs == 10       # inherited
        assert cfg.name == "base"

        cfg = get_config(str(child), argv=["--optim.epochs", "3"])
        assert cfg.optim.epochs == 3        # CLI wins

    def test_bool_override(self, tmp_path):
        from mindaudio_tpu.train.config import get_config

        y = tmp_path / "c.yaml"
        y.write_text("flag: true\n")
        cfg = get_config(str(y), argv=["--flag", "false"])
        assert cfg.flag is False


class TestTokenizer:
    def test_roundtrip_and_special_ids(self, tmp_path):
        from mindaudio_tpu.utils.tokenizer import CharTokenizer

        tok = CharTokenizer.from_transcripts(["你好 世界", "hello"])
        assert tok.blank_id == 0 and tok.unk_id == 1
        assert tok.sos == tok.eos == tok.vocab_size - 1
        ids = tok.encode("你好")
        assert tok.decode(ids) == "你好"
        assert tok.encode("§") == [tok.unk_id]  # unseen char -> unk

        path = str(tmp_path / "lang_char.txt")
        tok.save(path)
        tok2 = CharTokenizer.from_file(path)
        assert tok2.vocab_size == tok.vocab_size
        assert tok2.encode("你好") == ids


class TestCMVN:
    def test_masked_stats_roundtrip(self, tmp_path):
        from mindaudio_tpu.utils.cmvn import CMVNAccumulator, load_cmvn, save_cmvn

        rng = np.random.default_rng(0)
        feats = rng.standard_normal((4, 50, 8)) * 3.0 + 1.5
        lens = np.array([50, 30, 10, 45])
        acc = CMVNAccumulator(8)
        acc.update(feats, lens)
        mean, istd = acc.finalize()

        valid = np.concatenate([feats[i, : lens[i]] for i in range(4)])
        np.testing.assert_allclose(mean, valid.mean(0), rtol=1e-5)
        np.testing.assert_allclose(istd, 1 / valid.std(0), rtol=1e-4)

        path = str(tmp_path / "cmvn.json")
        save_cmvn(path, acc)
        m2, i2 = load_cmvn(path)
        np.testing.assert_allclose(m2, mean, rtol=1e-6)
        np.testing.assert_allclose(i2, istd, rtol=1e-6)


class TestCheckpointManager:
    def test_retention_and_best(self, tmp_path):
        from mindaudio_tpu.train.checkpoint import (
            CheckpointManager, average_checkpoints, list_steps,
        )

        mgr = CheckpointManager(str(tmp_path), keep_max=3)
        for step, metric in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 2.0)]:
            mgr.save({"w": np.full((2,), float(step), np.float32)}, step,
                     eval_metric=metric)
        assert list_steps(str(tmp_path)) == [2, 3, 4]  # keep_max pruned step 1
        assert mgr.best_steps(2) == [4, 2]             # lowest metric first

        avg = average_checkpoints(str(tmp_path), [2, 4])
        np.testing.assert_allclose(avg["w"], np.full((2,), 3.0))


class TestProfiler:
    def test_step_timer(self):
        from mindaudio_tpu.train.profiler import StepTimer

        t = StepTimer(total_steps=10, warmup=1)
        for _ in range(3):
            with t:
                pass
        assert t.count == 3
        assert t.avg_ms >= 0
        assert t.eta_s is not None
        assert "step 3" in t.summary()


class TestTrainStep:
    def test_make_train_step_and_nonfinite_skip(self):
        import jax
        import jax.numpy as jnp
        import optax

        from mindaudio_tpu.train.state import TrainState, make_train_step

        def loss_fn(params, state, batch, rng):
            loss = ((params["w"] * batch["x"]) ** 2).sum() * batch["scale"]
            return loss, {}

        params = {"w": jnp.ones((4,))}
        state = TrainState.create(
            apply_fn=None, params=params, tx=optax.sgd(0.1),
        )
        step = make_train_step(loss_fn, grad_clip_norm=1.0)

        good = {"x": jnp.ones((4,)), "scale": jnp.asarray(1.0)}
        state2, metrics = step(state, good)
        assert float(metrics["loss"]) == pytest.approx(4.0)
        assert not np.allclose(np.asarray(state2.params["w"]), 1.0)

        # a nan batch must leave the params untouched (snapshot first: the
        # step donates its input state buffers)
        w_before = np.asarray(state2.params["w"]).copy()
        bad = {"x": jnp.ones((4,)), "scale": jnp.asarray(np.nan)}
        state3, metrics = step(state2, bad)
        np.testing.assert_array_equal(np.asarray(state3.params["w"]), w_before)

    def test_backward_only_overflow_skipped(self):
        """Finite loss + inf grads (the round-1 hole): params must not move.

        A loss that is finite in the forward pass can still overflow in the
        backward pass; the reference catches this with a FloatStatus check on
        the *gradients* (reference utils/train_one_step.py:44-46).
        """
        import jax
        import jax.numpy as jnp
        import optax

        from mindaudio_tpu.train.state import TrainState, make_train_step

        @jax.custom_vjp
        def finite_fwd_inf_bwd(w):
            return (w**2).sum()

        def _fwd(w):
            return finite_fwd_inf_bwd(w), w

        def _bwd(w, g):
            return (jnp.full_like(w, jnp.inf),)

        finite_fwd_inf_bwd.defvjp(_fwd, _bwd)

        def loss_fn(params, state, batch, rng):
            return finite_fwd_inf_bwd(params["w"]), {}

        params = {"w": jnp.ones((4,))}
        state = TrainState.create(apply_fn=None, params=params,
                                  tx=optax.sgd(0.1))
        step = make_train_step(loss_fn, grad_clip_norm=1.0, donate=False)
        new_state, metrics = step(state, {"x": jnp.ones(())})
        assert np.isfinite(float(metrics["loss"]))  # forward was fine
        np.testing.assert_array_equal(np.asarray(new_state.params["w"]),
                                      np.ones(4))
        assert int(new_state.step) == 1  # the step counter still advances

    def test_clip_by_global_norm_guards_nonfinite(self):
        import jax.numpy as jnp

        from mindaudio_tpu.train.state import clip_by_global_norm

        g = {"a": jnp.asarray([3.0, 4.0])}
        clipped, gnorm = clip_by_global_norm(g, 1.0)
        assert float(gnorm) == pytest.approx(5.0)
        np.testing.assert_allclose(np.asarray(clipped["a"]),
                                   [0.6, 0.8], rtol=1e-5)

        g_inf = {"a": jnp.asarray([jnp.inf, 1.0]), "b": jnp.asarray([2.0])}
        clipped, gnorm = clip_by_global_norm(g_inf, 1.0)
        assert not np.isfinite(float(gnorm))
        # finite leaves are zeroed (scale 0), inf leaf is NaN — either way
        # skip_nonfinite_update(grads=...) then rejects the update
        np.testing.assert_array_equal(np.asarray(clipped["b"]), [0.0])


class TestPrefetch:
    def test_order_and_transform(self):
        from mindaudio_tpu.train.prefetch import prefetch

        out = list(prefetch(iter(range(20)), size=3, transform=lambda x: x * 2))
        assert out == [x * 2 for x in range(20)]

    def test_worker_exception_propagates(self):
        from mindaudio_tpu.train.prefetch import prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen(), size=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)


class TestReviewRegressions:
    """Regression tests for the round-1 infrastructure review findings."""

    def test_prune_protects_best_scored_steps(self, tmp_path):
        from mindaudio_tpu.train.checkpoint import CheckpointManager, list_steps

        mgr = CheckpointManager(str(tmp_path), keep_max=2, keep_best=2)
        # best eval metric lands early (step 1) — recency-only pruning
        # would delete it and break average_best
        for step, metric in [(1, 1.0), (2, 9.0), (3, 8.0), (4, 7.0)]:
            mgr.save({"w": np.full((2,), float(step), np.float32)}, step,
                     eval_metric=metric)
        kept = list_steps(str(tmp_path))
        assert 1 in kept                     # best-scored survives
        assert set(kept) >= {3, 4}           # recency window survives
        assert 2 not in kept                 # neither recent nor best
        assert 2 not in mgr.scores           # pruned step dropped its score
        avg = mgr.average_best(1)
        np.testing.assert_allclose(avg["w"], np.full((2,), 1.0))

    def test_average_preserves_integer_leaves(self, tmp_path):
        from mindaudio_tpu.train.checkpoint import (
            average_checkpoints, save_checkpoint,
        )

        for step in (1, 2):
            save_checkpoint(str(tmp_path), {
                "w": np.full((2,), float(step), np.float32),
                "count": np.asarray(step * 10, np.int32),
            }, step)
        avg = average_checkpoints(str(tmp_path), [1, 2])
        np.testing.assert_allclose(avg["w"], np.full((2,), 1.5))
        assert avg["count"].dtype == np.int32     # not averaged to float
        assert int(avg["count"]) == 20            # latest step's value

    def test_finite_loss_nonfinite_grads_skipped(self):
        import jax.numpy as jnp
        import optax

        from mindaudio_tpu.train.state import TrainState, make_train_step

        def loss_fn(params, state, batch, rng):
            # loss is finite (sqrt(0) = 0) but d/dw sqrt(w*x) at w=0 is inf
            return jnp.sqrt(params["w"] * batch["x"]).sum(), {}

        state = TrainState.create(
            apply_fn=None, params={"w": jnp.zeros((4,))}, tx=optax.sgd(0.1))
        step = make_train_step(loss_fn)
        new_state, metrics = step(state, {"x": jnp.ones((4,))})
        assert np.isfinite(float(metrics["loss"]))
        np.testing.assert_array_equal(np.asarray(new_state.params["w"]),
                                      np.zeros((4,)))  # update skipped

    def test_prefetch_early_abandon_stops_worker(self):
        import itertools
        import time

        from mindaudio_tpu.train.prefetch import prefetch

        produced = []

        def gen():
            for i in itertools.count():
                produced.append(i)
                yield i

        it = prefetch(gen(), size=2)
        assert next(it) == 0
        it.close()  # abandon: GeneratorExit must stop the producer
        time.sleep(0.5)
        n = len(produced)
        time.sleep(0.4)
        assert len(produced) == n, "producer kept running after abandon"

    def test_cli_float_over_int_default_and_null(self, tmp_path):
        import yaml

        from mindaudio_tpu.train.config import get_config

        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump(
            {"ctc_weight": 0, "resume": None, "name": "x", "ver": "1.9"}))
        cfg = get_config(str(p), ["--ctc_weight", "0.3", "--resume", "5",
                                  "--ver", "2.0"])
        assert cfg["ctc_weight"] == pytest.approx(0.3)
        assert cfg["resume"] == 5 and isinstance(cfg["resume"], int)
        assert cfg["ver"] == "2.0"  # string-typed keys keep literal text

    def test_add_blank_replaces_ignore_id(self):
        from mindaudio_tpu.utils.common import IGNORE_ID, add_blank

        ys = np.asarray([[5, 7, IGNORE_ID]])
        out = add_blank(ys, blank=0)
        assert out.tolist() == [[0, 5, 0, 7, 0, 0, 0]]
        assert (out >= 0).all()

    def test_get_logger_reconfigures_on_explicit_args(self, tmp_path):
        from mindaudio_tpu.train.log import get_logger

        first = get_logger("t_reconf")  # defaults
        second = get_logger("t_reconf", log_dir=str(tmp_path), rank=3,
                            stdout_ranks=())
        assert second is not first or any(
            getattr(h, "baseFilename", "").startswith(str(tmp_path))
            for h in second.handlers)
        import os

        assert os.path.exists(os.path.join(str(tmp_path), "t_reconf.log"))
        # a later don't-care default call must not downgrade the config
        third = get_logger("t_reconf")
        assert any(getattr(h, "baseFilename", "").startswith(str(tmp_path))
                   for h in third.handlers)


class TestConfigListFlags:
    def test_list_key_cli_override(self, tmp_path):
        import yaml

        from mindaudio_tpu.train.config import get_config

        cfg_file = tmp_path / "c.yaml"
        cfg_file.write_text(yaml.safe_dump(
            {"data": {"frame_bucket_limit": [200, 400], "batch": 8}}))
        cfg = get_config(str(cfg_file),
                         argv=["--data.frame_bucket_limit", "[227, 419]"])
        assert cfg.data.frame_bucket_limit == [227, 419]
        # bare scalar over a list key becomes a one-element list
        cfg = get_config(str(cfg_file), argv=["--data.frame_bucket_limit", "227"])
        assert cfg.data.frame_bucket_limit == [227]


class TestPersistedEvalScores:
    def test_scores_survive_process_restart(self, tmp_path):
        import jax.numpy as jnp

        from mindaudio_tpu.train.checkpoint import CheckpointManager, load_scores

        d = str(tmp_path / "ck")
        m = CheckpointManager(d, keep_max=5)
        for step, loss in [(100, 3.0), (200, 1.0), (300, 2.0)]:
            m.save({"w": jnp.ones((2,)) * step}, step, eval_metric=loss)
        # a fresh manager (new process) sees the recorded scores
        m2 = CheckpointManager(d, keep_max=5)
        assert m2.best_steps(2) == [200, 300]
        assert load_scores(d) == {100: 3.0, 200: 1.0, 300: 2.0}


class TestFastDropoutRng:
    def test_key_data_roundtrip(self):
        import jax
        import jax.numpy as jnp

        from mindaudio_tpu.train.state import as_dropout_key, fast_dropout_rng

        rng = fast_dropout_rng(7)
        key = as_dropout_key(rng)
        # fold_in + bits works whatever the impl
        sub = jax.random.fold_in(key, 3)
        bits = jax.random.bits(sub, (4,))
        assert bits.shape == (4,)
        # typed keys pass through; legacy (2,) data wraps as threefry
        assert as_dropout_key(key) is key
        legacy = jax.random.PRNGKey(0)
        v1 = jax.random.normal(as_dropout_key(legacy), (3,))
        v2 = jax.random.normal(legacy, (3,))
        assert jnp.allclose(v1, v2)
        # rbg key data (4,) wraps as rbg and is usable
        rbg_data = jax.random.key_data(jax.random.key(1, impl="rbg"))
        out = jax.random.normal(as_dropout_key(rbg_data), (3,))
        assert out.shape == (3,)


class TestCTCLoss:
    def test_matches_optax_values_and_grads(self):
        """The unrolled-scan CTC recursion must equal optax.ctc_loss (same
        Graves forward algorithm) in value AND gradient, for every unroll."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from mindaudio_tpu.loss.ctc_loss import ctc_loss

        rng = np.random.default_rng(0)
        b, t, k, n = 3, 37, 11, 9
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([37, 25, 10], jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, size=(b, n)), jnp.int32)
        # include a repeated label to exercise the repeat-transition branch
        labels = labels.at[0, 2].set(labels[0, 1])
        label_lens = jnp.asarray([9, 5, 2], jnp.int32)

        def optax_mean(lg):
            lp = (jnp.arange(t)[None] >= logit_lens[:, None]).astype(jnp.float32)
            labp = (jnp.arange(n)[None] >= label_lens[:, None]).astype(jnp.float32)
            return optax.ctc_loss(lg, lp, labels, labp, blank_id=0).mean()

        want, want_g = jax.value_and_grad(optax_mean)(logits)
        for unroll in (1, 8):
            got, got_g = jax.value_and_grad(
                lambda lg: ctc_loss(lg, logit_lens, labels, label_lens,
                                    unroll=unroll))(logits)
            np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                       rtol=1e-4, atol=1e-5)
