"""Tests for the gin-compatible config engine, including parsing the five
shipped reference-format config files."""

import os

import pytest

from greedy_multimodal_learning_tpu import config as cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_basic_bindings():
    cfg.parse_config(
        """
        # a comment
        train.batch_size=8
        train.lr = 0.1
        train.callbacks=['CompletedStopping', 'ReduceLROnPlateau']
        Bias_Mitigation_Strong.MMTMnames = ['visual', 'skeleton']
        get_mvdcndata.specific_views=[0, 6]# trailing comment
        MMTM_MVCNN.device='cuda:0'
        """
    )
    assert cfg.query("train", "batch_size") == 8
    assert cfg.query("train", "lr") == 0.1
    assert cfg.query("train", "callbacks") == ["CompletedStopping", "ReduceLROnPlateau"]
    assert cfg.query("Bias_Mitigation_Strong", "MMTMnames") == ["visual", "skeleton"]
    assert cfg.query("get_mvdcndata", "specific_views") == [0, 6]
    assert cfg.query("MMTM_MVCNN", "device") == "cuda:0"


def test_configurable_function_injection():
    @cfg.configurable
    def f(a, b=1, c=2):
        return a, b, c

    cfg.parse_config("f.b=10\nf.c=20")
    assert f(0) == (0, 10, 20)
    # caller-supplied kwargs win over bindings
    assert f(0, c=5) == (0, 10, 5)
    # positional args win over bindings
    assert f(0, 7) == (0, 7, 20)


def test_configurable_class_injection():
    @cfg.configurable
    class K:
        def __init__(self, x=0, y=0):
            self.x = x
            self.y = y

    cfg.parse_config("K.x=3")
    k = K()
    assert (k.x, k.y) == (3, 0)
    k2 = K(x=9, y=1)
    assert (k2.x, k2.y) == (9, 1)


def test_macros_and_references():
    @cfg.configurable
    def target():
        return "made"

    cfg.parse_config(
        """
        LR = 0.5
        opt.lr = %LR
        opt.factory = @target
        opt.made = @target()
        """
    )
    assert cfg.query("opt", "lr") == 0.5
    assert cfg.query("opt", "factory").resolve()() == "made"
    assert cfg.query("opt", "made").resolve() == "made"


def test_parse_shipped_configs():
    """Our five shipped configs (same binding names as the reference's) must
    all parse."""
    cfgdir = os.path.join(REPO, "configs")
    names = ["training.gin", "training_guided.gin", "training_random.gin", "recording.gin", "eval.gin"]
    for name in names:
        path = os.path.join(cfgdir, name)
        if not os.path.exists(path):
            pytest.skip(f"{name} not written yet")
        cfg.clear_config()
        cfg.parse_config_file(path)
        assert cfg.CONFIG, name


def test_hash_separated_binding_string():
    cfg.parse_config_files_and_bindings([], "a.b=1\na.c=2")
    assert cfg.query("a", "b") == 1
    assert cfg.query("a", "c") == 2


def test_required_raises():
    @cfg.configurable
    def g(x=cfg.REQUIRED):
        return x

    with pytest.raises(cfg.ConfigError):
        g()
    cfg.parse_config("g.x=5")
    assert g() == 5


def test_parse_reference_config_files():
    """The engine must parse the reference repo's original gin files
    unchanged (full binding-surface compatibility)."""
    refdir = "/root/reference/configs"
    if not os.path.isdir(refdir):
        pytest.skip("reference not mounted")
    for name in sorted(os.listdir(refdir)):
        cfg.clear_config()
        cfg.parse_config_file(os.path.join(refdir, name))
        assert cfg.CONFIG, name
    # spot-check values from the reference's training_guided.gin
    cfg.clear_config()
    cfg.parse_config_file(os.path.join(refdir, "training_guided.gin"))
    assert cfg.query("train", "batch_size") == 8
    assert cfg.query("Bias_Mitigation_Strong", "starting_epoch") == 1
    assert cfg.query("Bias_Mitigation_Strong", "MMTMnames") == ["visual", "skeleton"]
    assert cfg.query("get_mvdcndata", "specific_views") == [0, 6]
    assert cfg.query("training_loop", "n_epochs") == 300


def test_brackets_inside_string_values_dont_break_parsing():
    """Bracket-balance continuation must ignore brackets inside string
    literals: a value like 'split [train' must not swallow later lines."""
    cfg.clear_config()
    cfg.parse_config(
        """
        Thing.note = 'split [train'
        Thing.after = 7
        """
    )
    assert cfg.query("Thing", "note", None) == "split [train"
    assert cfg.query("Thing", "after", None) == 7
    cfg.clear_config()


def test_escaped_backslash_before_closing_quote():
    r"""A literal ending in an escaped backslash ("C:\\") closes its string;
    a trailing comment after it is stripped."""
    cfg.clear_config()
    cfg.parse_config('Thing.path = "C:\\\\"  # windows path')
    assert cfg.query("Thing", "path", None) == "C:\\"
    cfg.clear_config()
