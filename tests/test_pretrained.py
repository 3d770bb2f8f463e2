"""Pretrained-initialization tests (reference train_end2end.py's
load_param + merge step, SURVEY.md §3.2): MXNet-file -> merge -> frozen
fine-tune round trip, fully synthetic."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_convert import _write_mxnet_params


def _find(tree, path):
    d = tree
    for p in path:
        d = d[p]
    return np.asarray(d)


def test_caffe_name_merge_into_backbone(tiny_accel):
    """Every Caffe/MSRA resnet name the table generates for depth 18 must
    land on a real leaf of the ref backbone, transposed OIHW->HWIO."""
    from accel_tpu.core.pretrained import caffe_resnet_table, merge_pretrained

    m, variables = tiny_accel
    table = caffe_resnet_table(18)
    rng = np.random.default_rng(0)

    arg, aux = {}, {}
    expected = {}
    n_skipped = 0
    for name, (coll, rel) in table.items():
        tree = variables[coll]
        try:
            leaf = _find(tree, ("ref_net", "backbone") + rel)
        except KeyError:
            # branch1/downsample exists only on shape-changing blocks; real
            # pretrained files simply don't carry the missing names
            n_skipped += 1
            continue
        if leaf.ndim == 4:
            src = rng.standard_normal(
                (leaf.shape[3], leaf.shape[2], leaf.shape[0], leaf.shape[1])
            ).astype(np.float32)  # OIHW
            expected[(coll, rel)] = np.transpose(src, (2, 3, 1, 0))
        else:
            src = rng.standard_normal(leaf.shape).astype(np.float32)
            expected[(coll, rel)] = src
        (aux if coll == "batch_stats" else arg)[name] = src
    # plus junk the reference files carry (ImageNet classifier)
    arg["fc1000_weight"] = rng.standard_normal((1000, 512)).astype(np.float32)

    merged, rep = merge_pretrained(
        variables, arg, aux, submodule=("ref_net", "backbone"), depth=18
    )
    assert rep["matched"] == len(table) - n_skipped, (
        rep["unmatched"], rep["skipped_shape"],
    )
    assert rep["unmatched"] == ["fc1000_weight"]
    for (coll, rel), want in expected.items():
        got = _find(merged[coll], ("ref_net", "backbone") + rel)
        np.testing.assert_array_equal(got, want)
    # untouched subtrees stay identical
    np.testing.assert_array_equal(
        _find(merged["params"], ("fusion", "kernel")),
        _find(variables["params"], ("fusion", "kernel")),
    )


def test_exact_path_merge_into_flownet(tiny_accel):
    from accel_tpu.core.pretrained import merge_pretrained

    m, variables = tiny_accel
    leaf = _find(variables["params"], ("flownet", "predict_flow2", "kernel"))
    src = np.full(leaf.shape, 0.25, np.float32)
    merged, rep = merge_pretrained(
        variables, {"predict_flow2/kernel": src}, {}, submodule=("flownet",)
    )
    assert rep["matched"] == 1 and not rep["unmatched"]
    np.testing.assert_array_equal(
        _find(merged["params"], ("flownet", "predict_flow2", "kernel")), src
    )


def test_train_from_pretrained_with_frozen_stages(tiny_accel, tmp_path):
    """The VERDICT r1 'done' criterion: write a synthetic MXNet .params,
    initialize training from it via the cfg path, run one step with
    FIXED_PARAMS freezing, assert frozen leaves didn't move (and did carry
    the pretrained values) while unfrozen leaves trained."""
    from accel_tpu.config import default_config
    from accel_tpu.core.pretrained import apply_pretrained_cfg
    from accel_tpu.core.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    m, variables = tiny_accel
    # deep-copy: the train step below donates its input state's buffers,
    # and the fixture is session-scoped
    variables = jax.tree.map(jnp.array, variables)
    rng = np.random.default_rng(1)

    conv1_tgt = _find(variables["params"], ("ref_net", "backbone", "conv1", "kernel"))
    conv1_src = rng.standard_normal(
        (conv1_tgt.shape[3], conv1_tgt.shape[2], conv1_tgt.shape[0], conv1_tgt.shape[1])
    ).astype(np.float32)
    gamma_src = rng.standard_normal(conv1_tgt.shape[3]).astype(np.float32)
    path = tmp_path / "resnet_tiny-0000.params"
    _write_mxnet_params(
        str(path),
        {"arg:conv1_weight": conv1_src, "arg:bn_conv1_gamma": gamma_src},
    )

    cfg = default_config()
    cfg.network.ref_depth = 18
    cfg.network.pretrained = str(tmp_path / "resnet_tiny")  # prefix convention
    cfg.network.pretrained_epoch = 0
    cfg.network.FIXED_PARAMS = ["conv1"]
    variables, reports = apply_pretrained_cfg(cfg, variables)
    assert reports["ref"]["matched"] == 2

    merged_conv1 = _find(variables["params"], ("ref_net", "backbone", "conv1", "kernel"))
    np.testing.assert_array_equal(merged_conv1, np.transpose(conv1_src, (2, 3, 1, 0)))

    tx, _ = make_optimizer(cfg, epoch_size=10)
    state = init_train_state(m, variables, tx)
    step = make_train_step(m, tx, num_classes=19)
    batch = {
        "data": jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32),
        "data_ref": jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32),
        "eq_flag": jnp.zeros((1,)),
        "label": jnp.asarray(rng.integers(0, 19, (1, 128, 128)), jnp.int32),
    }
    # snapshot before the step: the train step donates the state's buffers
    score_before = _find(variables["params"], ("ref_net", "head", "score", "kernel"))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    frozen_after = _find(
        new_state.variables["params"], ("ref_net", "backbone", "conv1", "kernel")
    )
    np.testing.assert_array_equal(
        frozen_after, np.transpose(conv1_src, (2, 3, 1, 0))
    )  # frozen leaf: pretrained values, unmoved by the step
    score_after = _find(
        new_state.variables["params"], ("ref_net", "head", "score", "kernel")
    )
    assert np.abs(score_after - score_before).max() > 0  # unfrozen leaf trained
