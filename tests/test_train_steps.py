"""Train-step integration: all three stage steps run jitted, update state,
and stage-1 actually learns the synthetic mapping; data-parallel execution
over the virtual 8-device mesh produces the same math as single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.models import BackboneConfig, DeeplabV2, DeeplabV2Config
from uemda_tpu.models.config import PPMConfig
from uemda_tpu.parallel import make_mesh, shard_batch, shard_pytree_replicated
from uemda_tpu.train.lr import poly_warmup_schedule
from uemda_tpu.train.optim import make_optimizer
from uemda_tpu.train.state import create_train_state
from uemda_tpu.train.steps import (
    StageHParams,
    make_align_step,
    make_init_proto_step,
    make_src_step,
    make_ssl_step,
)

C = 6
HW = 64


def _tiny_model():
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet18", output_stride=16),
        multi_layer=True,
        use_ppm=False,  # ASPP head: cheaper to compile
        ppm=PPMConfig(num_classes=C, fc_dim=512),
        inchannels=512,
        num_classes=C,
        is_ins_norm=True,
    )
    model = DeeplabV2(cfg)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.ones((1, HW, HW, 3)), train=False
    )
    return model, variables


def _hp(**kw):
    kw.setdefault("class_num", C)
    kw.setdefault("crop", (HW, HW))
    kw.setdefault("src_std", (64.0, 64.0, 64.0))
    kw.setdefault("src_mean", (128.0, 128.0, 128.0))
    kw.setdefault("tgt_std", (64.0, 64.0, 64.0))
    kw.setdefault("tgt_mean", (128.0, 128.0, 128.0))
    kw.setdefault("compute_dtype", "float32")  # CPU tests
    kw.setdefault("max_segments", 32)
    return StageHParams(**kw)


def _state(variables, feat_channels=512, stop=100):
    tx = make_optimizer(poly_warmup_schedule(1e-2, stop))
    return create_train_state(variables, tx, C, feat_channels=feat_channels)


def _batches(seed=0, b=4):
    rng = np.random.default_rng(seed)
    label = np.kron(
        rng.integers(0, C, size=(b, HW // 16, HW // 16)),
        np.ones((16, 16), np.int64),
    ).astype(np.int32)
    palette = np.linspace(40, 215, C)[:, None] * np.array([[1.0, 0.8, 0.6]])
    img = (palette[label] + rng.normal(0, 8, label.shape + (3,))).astype(np.float32)
    sup = np.kron(
        np.arange(16).reshape(4, 4), np.ones((16, 16), np.int64)
    )[None].repeat(b, 0).astype(np.int32)
    prob = np.full((b, HW, HW, C), 1.0 / C, np.float32)
    return (
        {"image": jnp.asarray(img), "label": jnp.asarray(label)},
        {"image": jnp.asarray(img[::-1].copy()), "sup": jnp.asarray(sup)},
        {
            "image": jnp.asarray(img[::-1].copy()),
            "prob": jnp.asarray(prob),
            "sup": jnp.asarray(sup),
        },
    )


def test_src_step_learns():
    model, variables = _tiny_model()
    state = _state(variables)
    step = make_src_step(model, _hp(align_domain=True))
    bs, bt, _ = _batches()
    losses = []
    for i in range(8):
        state, m = step(state, bs, {"image": bt["image"]}, jax.random.key(i))
        losses.append(float(m["loss_seg"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_align_step_updates_prototypes():
    model, variables = _tiny_model()
    state = _state(variables)
    step = make_align_step(model, _hp(refine=True, refine_mode="all"))
    bs, bt, _ = _batches(seed=1)
    p0 = np.asarray(state.aligner.prototypes).copy()
    state, m = step(state, bs, bt, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss_align"]) > 0
    assert not np.allclose(np.asarray(state.aligner.prototypes), p0)


@pytest.mark.parametrize("target_loss", ["uvem", "ups", "ohem", "focal", "ghm", "gdp", "ce", "none"])
def test_ssl_step_all_target_losses(target_loss):
    model, variables = _tiny_model()
    state = _state(variables)
    step = make_ssl_step(
        model, _hp(target_loss=target_loss, refine=True, balance_target=False)
    )
    bs, _, bt = _batches(seed=2)
    state, m = step(state, bs, bt, jax.random.key(0))
    assert np.isfinite(float(m["loss"])), target_loss


@pytest.mark.parametrize("mix", ["cutmix", "classmix"])
def test_mix_step_combo_uvem_refine(mix):
    """Beyond-reference combo: UVEM + online refinement on the mix step
    (tools/train_ssl_mix.py --lt uvem --refine-label 1). Prototypes advance,
    loss finite; the legacy path on the same inputs leaves them untouched."""
    from uemda_tpu.train.steps import make_mix_step

    model, variables = _tiny_model()
    hp_combo = _hp(target_loss="uvem", refine=True, refine_mode="all")
    bs, _, bt = _batches(seed=4)

    # independent buffer copies — the step donates its input state
    state = _state(jax.tree.map(jnp.copy, variables))
    state2 = _state(jax.tree.map(jnp.copy, variables))
    step = make_mix_step(model, hp_combo, mix=mix, combo=True)
    p0 = np.asarray(state.aligner.prototypes).copy()
    state, m = step(state, bs, bt, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss_target"]))
    assert not np.allclose(np.asarray(state.aligner.prototypes), p0)

    legacy = make_mix_step(model, hp_combo, mix=mix, combo=False)
    state2, m2 = legacy(state2, bs, bt, jax.random.key(0))
    assert np.isfinite(float(m2["loss"]))
    assert np.allclose(np.asarray(state2.aligner.prototypes), p0)


@pytest.mark.parametrize("mixer_name", ["cutmix", "classmix"])
def test_mixing_probs_passthrough(mixer_name):
    """probs and the paste mask ride the same paste as the hard labels:
    with one-hot probs in, argmax(mixed probs) == mixed hard labels at every
    NON-ignore pixel; ignore pixels keep their all-zero one-hot rows (whose
    argmax is 0 while the hard label is -1 — the actual invariant is
    narrower than 'everywhere'); the mask marks exactly the source pixels."""
    from uemda_tpu.ops.labels import one_hot_ignore
    from uemda_tpu.ops.mixing import classmix, cutmix

    bs, _, _ = _batches(seed=5, b=2)
    bt, _, _ = _batches(seed=6, b=2)
    # inject ignore pixels on both sides to pin the ignore semantics
    lab_s = np.asarray(bs["label"]).copy()
    lab_t = np.asarray(bt["label"]).copy()
    lab_s[:, :3, :5] = -1
    lab_t[:, -4:, -2:] = -1
    lab_s, lab_t = jnp.asarray(lab_s), jnp.asarray(lab_t)
    probs_s = one_hot_ignore(lab_s, C, -1)
    probs_t = one_hot_ignore(lab_t, C, -1)
    if mixer_name == "cutmix":
        out = cutmix(jax.random.key(1), bs["image"], lab_s,
                     bt["image"], lab_t, probs_s=probs_s, probs_t=probs_t)
    else:
        out = classmix(jax.random.key(1), bs["image"], lab_s,
                       bt["image"], lab_t, class_num=C,
                       probs_s=probs_s, probs_t=probs_t)
    assert len(out) == 6
    _, _, _, mixed_t, soft_t, paste = out
    mixed_t, soft_t, paste = map(np.asarray, (mixed_t, soft_t, paste))
    assert paste.shape == mixed_t.shape and paste.dtype == np.bool_
    valid = mixed_t != -1
    np.testing.assert_array_equal(
        np.argmax(soft_t, -1)[valid], mixed_t[valid]
    )
    # ignore pixels carry all-zero one-hot rows through the paste
    np.testing.assert_array_equal(soft_t[~valid], 0.0)
    # the mask IS the paste: source labels where True, target where False
    np.testing.assert_array_equal(mixed_t[paste], np.asarray(lab_s)[paste])
    np.testing.assert_array_equal(mixed_t[~paste], np.asarray(lab_t)[~paste])
    assert paste.any() and not paste.all()
    # and the 4-return legacy signature is unchanged
    legacy = cutmix(jax.random.key(1), bs["image"], lab_s,
                    bt["image"], lab_t)
    assert len(legacy) == 4


def test_uvem_paste_mask_trains_clean_pixels():
    """Pasted clean supervision is one-hot => entropy 0 => UVEM parabola
    weight 0. With the paste mask those pixels must train at weight 1
    (plain CE) and be counted in valid_cnt; without it the loss is ~0."""
    from uemda_tpu.alignment.losses import (
        cross_entropy_per_pixel,
        uvem_loss,
    )
    from uemda_tpu.ops.labels import one_hot_ignore

    rng = np.random.default_rng(3)
    b, hw = 2, 8
    logits = jnp.asarray(rng.normal(size=(b, hw, hw, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, size=(b, hw, hw)).astype(np.int32))
    labels = labels.at[:, 0, 0].set(-1)  # a few ignore pixels
    soft = one_hot_ignore(labels, C, -1)  # all-pasted scenario: u == 0
    paste = jnp.ones((b, hw, hw), bool)

    no_mask = float(uvem_loss(logits, labels, soft))
    assert abs(no_mask) < 1e-5  # w(0)=0 but valid_cnt>0 -> ~0 (the old bug)

    with_mask = float(uvem_loss(logits, labels, soft, paste_mask=paste))
    ce = cross_entropy_per_pixel(
        logits.reshape(-1, C), labels.reshape(-1)
    )
    valid = (labels.reshape(-1) != -1)
    expect = float(ce.sum() / (valid.sum() + 1e-7))
    np.testing.assert_allclose(with_mask, expect, rtol=1e-6)

    # mixed scenario: mask only where pasted; unpasted pixels keep the
    # reference UVEM weighting bit-for-bit
    half = jnp.zeros((b, hw, hw), bool).at[:, : hw // 2].set(True)
    soft_t = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(b, hw, hw, C)).astype(np.float32)), -1
    )
    soft_mixed = jnp.where(half[..., None], soft, soft_t)
    mixed = float(uvem_loss(logits, labels, soft_mixed, paste_mask=half))
    assert np.isfinite(mixed) and mixed > 0


def test_init_proto_step_accumulates():
    model, variables = _tiny_model()
    state = _state(variables)
    step = make_init_proto_step(model, _hp())
    bs, _, _ = _batches(seed=3)
    state = step(state, bs, jax.random.key(0))
    assert float(state.aligner.data_cnt.sum()) > 0


def test_data_parallel_mesh_matches_single_device():
    model, variables = _tiny_model()
    hp = _hp(align_domain=False)
    step = make_src_step(model, hp)
    bs, bt, _ = _batches(seed=4, b=8)

    # independent buffer copies — the step donates its input state
    state1 = _state(jax.tree.map(jnp.copy, variables))
    state2 = _state(jax.tree.map(jnp.copy, variables))

    state1, m1 = step(state1, bs, {"image": bt["image"]}, jax.random.key(0))

    mesh = make_mesh(8)
    state2 = shard_pytree_replicated(mesh, state2)
    sbs = shard_batch(mesh, bs)
    sbt = shard_batch(mesh, {"image": bt["image"]})
    state2, m2 = step(state2, sbs, sbt, jax.random.key(0))
    assert len(jax.tree.leaves(state2.params)[0].sharding.device_set) == 8
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(state1.params)[0]
    l2 = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-3, atol=1e-5)


def test_full_state_checkpoint_exact_resume(tmp_path):
    """Save the FULL TrainState (params+opt+aligner+balance+ghm) mid-run,
    restore, continue — must match an uninterrupted run bit-for-bit."""
    import jax.numpy as jnp2

    from uemda_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    model, variables = _tiny_model()
    hp = _hp(align_domain=False)
    step = make_src_step(model, hp)
    bs, bt, _ = _batches(seed=8)
    tgt = {"image": bt["image"]}

    def fresh():
        return _state(jax.tree.map(jnp2.copy, variables))

    # uninterrupted: 5 steps
    s_full = fresh()
    for i in range(5):
        s_full, _ = step(s_full, bs, tgt, jax.random.key(i))

    # interrupted: 3 steps -> checkpoint -> restore -> 2 steps
    s_a = fresh()
    for i in range(3):
        s_a, _ = step(s_a, bs, tgt, jax.random.key(i))
    path = str(tmp_path / "full_state.msgpack")
    save_checkpoint(path, s_a)
    s_b = load_checkpoint(path, fresh())
    for i in range(3, 5):
        s_b, _ = step(s_b, bs, tgt, jax.random.key(i))

    assert int(s_full.step) == int(s_b.step) == 5
    for la, lb in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(
        np.asarray(s_full.balance_s.freq), np.asarray(s_b.balance_s.freq)
    )


def test_align_simple_step_runs():
    """train_align (PCL w/o refine, conf-gated stride-16 pseudo labels)."""
    from uemda_tpu.train.steps import make_align_simple_step

    model, variables = _tiny_model()
    state = _state(variables)
    step = make_align_simple_step(model, _hp(align_domain=True), conf_thresh=0.5)
    bs, bt, _ = _batches(seed=9)
    state, m = step(state, bs, {"image": bt["image"]}, jax.random.key(0))
    assert np.isfinite(float(m["loss_align"]))
    assert np.isfinite(float(m["loss_domain"]))


def test_loop_resume_matches_uninterrupted(tmp_path):
    """run_training_loop with state_path + start_step: interrupt after 2 of 4
    steps, maybe_resume from the snapshot, finish — params must match an
    uninterrupted 4-step run exactly (fold_in keys make the sequence
    stateless in the step index)."""
    import itertools
    import logging

    from uemda_tpu.train.loop import LoopHooks, maybe_resume, run_training_loop

    model, variables = _tiny_model()
    hp = _hp(align_domain=False)
    step = make_src_step(model, hp)
    bs, bt, _ = _batches(seed=11)
    tgt = {"image": bt["image"]}
    logger = logging.getLogger("resume-test")

    def iters():
        return itertools.repeat(bs), itertools.repeat(tgt)

    # uninterrupted 4 steps
    si, ti = iters()
    s_full = run_training_loop(
        _state(jax.tree.map(jnp.copy, variables)), step, si, ti, 4, logger,
        LoopHooks(eval_every=10**9), rng_seed=7,
    )

    # interrupted: 2 steps with a state snapshot at the end, then resume
    run_dir = str(tmp_path)
    path = f"{run_dir}/state_curr.msgpack"
    si, ti = iters()
    run_training_loop(
        _state(jax.tree.map(jnp.copy, variables)), step, si, ti, 2, logger,
        LoopHooks(eval_every=10**9, state_path=path), rng_seed=7,
    )
    s_b, start, state_path = maybe_resume(
        _state(jax.tree.map(jnp.copy, variables)), run_dir, "auto", logger
    )
    assert start == 2 and state_path == path
    si, ti = iters()
    s_b = run_training_loop(
        s_b, step, si, ti, 4, logger,
        LoopHooks(eval_every=10**9, state_path=path), rng_seed=7,
        start_step=start,
    )

    assert int(s_full.step) == int(s_b.step) == 4
    for la, lb in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_loop_deadline_failure_detection():
    """_deadline returns results, re-raises worker errors, and raises
    TimeoutError on a hung readback (the axon-tunnel death mode)."""
    import time as _time

    import pytest as _pytest

    from uemda_tpu.train.loop import _deadline

    assert _deadline(lambda: 42, 5.0, "ok") == 42
    assert _deadline(lambda: 42, 0, "disabled") == 42
    with _pytest.raises(ValueError):
        _deadline(lambda: (_ for _ in ()).throw(ValueError("boom")), 5.0, "err")
    with _pytest.raises(TimeoutError, match="resume auto"):
        _deadline(lambda: _time.sleep(30), 0.2, "hang")


def test_checkpoint_backends_roundtrip(tmp_path):
    """AsyncSaver writes the same bytes as the sync path; the orbax backend
    round-trips the full TrainState structure."""
    from uemda_tpu.train.checkpoints import (
        AsyncSaver,
        load_checkpoint,
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    model, variables = _tiny_model()
    state = _state(variables)

    saver = AsyncSaver()
    p1 = str(tmp_path / "async.msgpack")
    saver.save(p1, state)
    saver.wait()
    back = load_checkpoint(p1, _state(jax.tree.map(jnp.copy, variables)))
    for la, lb in zip(jax.tree.leaves(state.params), jax.tree.leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    p2 = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(p2, state)
    back2 = load_checkpoint_orbax(p2, _state(jax.tree.map(jnp.copy, variables)))
    assert type(back2) is type(state)
    for la, lb in zip(jax.tree.leaves(state.params), jax.tree.leaves(back2.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(
        np.asarray(state.aligner.prototypes), np.asarray(back2.aligner.prototypes)
    )


def test_two_identical_runs_are_bitwise_deterministic():
    """Same seed + same data stream => bitwise-identical params after the
    loop (explicit determinism guarantee; the reference seeds torch but runs
    cudnn.benchmark so it is NOT deterministic — SURVEY §5)."""
    import itertools
    import logging

    from uemda_tpu.train.loop import LoopHooks, run_training_loop

    model, variables = _tiny_model()
    step = make_src_step(model, _hp(align_domain=False))
    bs, bt, _ = _batches(seed=13)
    logger = logging.getLogger("determinism-test")

    def run():
        return run_training_loop(
            _state(jax.tree.map(jnp.copy, variables)), step,
            itertools.repeat(bs), itertools.repeat({"image": bt["image"]}),
            3, logger, LoopHooks(eval_every=10**9), rng_seed=21,
        )

    a, b = run(), run()
    for la, lb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(
        np.asarray(a.balance_s.freq), np.asarray(b.balance_s.freq)
    )


def test_loop_steps_per_call_matches_per_step():
    """steps_per_call correctness, two layers:

    (1) ONE chunk == the same steps run sequentially, to f32 ulp level
        (the scan compiles the identical math; only fusion-order rounding
        differs — measured 6e-8 max param diff after 2 steps).
    (2) the full loop with K=3 and log_every=3 (per-step at clamped
        boundaries, one full chunk where K fits) consumes the same
        batch/key sequence and
        lands within rounding-chaos tolerance of the per-step loop after 7
        SGD steps. Bitwise equality is NOT expected across different XLA
        compilations of the same math."""
    import logging

    from uemda_tpu.train.loop import (
        LoopHooks,
        _make_multi_step,
        _stack_batches,
        run_training_loop,
    )

    model, variables = _tiny_model()
    hp = _hp(align_domain=False)
    step = make_src_step(model, hp)
    logger = logging.getLogger("chunk-test")
    key0 = jax.random.key(7)

    def batch_at(i):
        b, bt_, _ = _batches(seed=100 + i)
        return b, {"image": bt_["image"]}

    # (1) one 2-step chunk vs two sequential steps
    s_seq = _state(jax.tree.map(jnp.copy, variables))
    for i in range(2):
        b, t = batch_at(i)
        s_seq, _ = step(s_seq, b, t, jax.random.fold_in(key0, i))
    multi = _make_multi_step(step, True)
    s_chunk = _state(jax.tree.map(jnp.copy, variables))
    bs = _stack_batches([batch_at(i)[0] for i in range(2)])
    bt = _stack_batches([batch_at(i)[1] for i in range(2)])
    s_chunk, _ = multi(s_chunk, bs, bt, key0, 0)
    assert int(s_chunk.step) == 2
    for la, lb in zip(jax.tree.leaves(s_seq.params),
                      jax.tree.leaves(s_chunk.params)):
        np.testing.assert_allclose(
            np.asarray(lb, np.float32), np.asarray(la, np.float32),
            atol=1e-6, rtol=1e-5)

    # (2) full loop, mixed chunk sizes, same sequence end to end
    def iters():
        def gen(kind):
            i = 0
            while True:
                b, t = batch_at(i)
                yield b if kind == "s" else t
                i += 1

        return gen("s"), gen("t")

    si, ti = iters()
    s_one = run_training_loop(
        _state(jax.tree.map(jnp.copy, variables)), step, si, ti, 7, logger,
        LoopHooks(eval_every=10**9, log_every=3), rng_seed=7,
    )
    si, ti = iters()
    s_k = run_training_loop(
        _state(jax.tree.map(jnp.copy, variables)), step, si, ti, 7, logger,
        LoopHooks(eval_every=10**9, log_every=3, steps_per_call=3),
        rng_seed=7,
    )
    assert int(s_one.step) == int(s_k.step) == 7
    # across DIFFERENT XLA compilations only rounding-chaos-level agreement
    # is expected after 7 SGD steps (the exact-math identity is part (1))
    for la, lb in zip(jax.tree.leaves(s_one.params),
                      jax.tree.leaves(s_k.params)):
        np.testing.assert_allclose(
            np.asarray(lb, np.float32), np.asarray(la, np.float32),
            atol=1e-2, rtol=0.0)


def test_loop_steps_per_call_chunk_schedule(monkeypatch):
    """The chunked loop's MECHANICS: with K=3, log_every=2 and 7 steps the
    chunked loop runs a full chunk ONLY where it fits inside every
    log/eval/stop boundary (k is always 1 or K — one scan compilation):
    with K=3, log_every=3 and 7 steps the single multi-step call must be
    [3@3] (i=0 first-log, i=1/2 boundary-clamped, i=6 stop-clamped all
    run per-step) and the stacked batches must hold the exact per-step
    batch sequence in order."""
    import logging

    from uemda_tpu.train import loop as L

    model, variables = _tiny_model()
    hp = _hp(align_domain=False)
    step = make_src_step(model, hp)
    logger = logging.getLogger("sched-test")

    def batch_at(i):
        b, bt_, _ = _batches(seed=100 + i)
        return b, {"image": bt_["image"]}

    calls = []
    real = L._make_multi_step

    def spy_make(step_fn, with_target):
        multi = real(step_fn, with_target)

        def wrapped(state, bs, bt, key0, i0):
            fps = [float(np.asarray(x).sum())
                   for x in np.asarray(bs["image"])]
            calls.append((int(i0), len(fps), fps))
            return multi(state, bs, bt, key0, i0)

        return wrapped

    monkeypatch.setattr(L, "_make_multi_step", spy_make)

    def gen(kind):
        i = 0
        while True:
            b, t = batch_at(i)
            yield b if kind == "s" else t
            i += 1

    L.run_training_loop(
        _state(jax.tree.map(jnp.copy, variables)), step, gen("s"), gen("t"),
        7, logger,
        L.LoopHooks(eval_every=10**9, log_every=3, steps_per_call=3),
        rng_seed=7,
    )
    assert [(i0, n) for i0, n, _ in calls] == [(3, 3)]
    for i0, n, fps in calls:
        for k in range(n):
            expect = float(np.asarray(batch_at(i0 + k)[0]["image"]).sum())
            assert abs(fps[k] - expect) < 1e-3, (i0, k)
