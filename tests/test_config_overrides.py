"""CLI `--set a.b=v` override parsing + application (config.py).

Reference equivalence: ``cfg_from_list`` / ``--set_cfgs`` in the
upstream config system — dotted-key overrides layered after the YAML
file."""

import pytest

from stereo_rcnn_tpu.config import load_config, parse_set_overrides


def test_parse_nested_pairs():
    ov = parse_set_overrides(["rcnn.roi_align_hat=kron_bf16",
                              "rcnn.roi_align_impl=pallas",
                              "backbone.norm=group"])
    assert ov == {"rcnn": {"roi_align_hat": "kron_bf16",
                           "roi_align_impl": "pallas"},
                  "backbone": {"norm": "group"}}


def test_applies_on_top_of_defaults():
    cfg = load_config(overrides=parse_set_overrides(
        ["rcnn.roi_align_hat=kron_bf16"]))
    assert cfg.rcnn.roi_align_hat == "kron_bf16"
    assert cfg.rcnn.roi_align_impl == "xla"        # untouched default


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(overrides=parse_set_overrides(["rcnn.not_a_knob=1"]))


def test_malformed_pair_rejected():
    with pytest.raises(ValueError):
        parse_set_overrides(["rcnn.roi_align_hat"])    # no '='
