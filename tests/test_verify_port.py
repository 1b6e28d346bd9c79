"""verify_port pipeline tests, incl. adversarial naming drift.

VERDICT r2 #4: the port must fail LOUDLY with actionable candidates when
checkpoint naming drifts (e.g. `decoder.blocks` instead of `dec_blocks`),
never silently skip modules; and the one-command pipeline must go
port → roundtrip → torch parity → forward on a well-formed checkpoint.
"""
import json
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_port_full import (TEncoder, TMemoryDecoder, _sd)  # noqa
from tests.test_port import _fake_reference_mask_transformer_sd  # noqa
from tools import verify_port as vp  # noqa


@pytest.fixture(scope="module")
def full_sd():
    """Complete v1-shaped synthetic checkpoint (small dims)."""
    from transformers import Dinov2Config, Dinov2Model

    from panst3r_tpu.models.mask_transformer import MaskTransformerConfig

    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    sd = {}
    sd.update(_sd(TEncoder(dim=32, depth=2, heads=2), "must3r_encoder"))
    sd.update(_sd(TMemoryDecoder(32, 24, 2, 2), "must3r_decoder"))
    hf = Dinov2Model(Dinov2Config(hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=2, mlp_ratio=2,
                                  image_size=28, patch_size=14))
    sd.update(_sd(hf, "dino_encoder.dinov2"))
    mt_cfg = MaskTransformerConfig(hidden_dim=32, ff_dim=64, mask_dim=16,
                                   num_queries=8, num_heads=4, dec_layers=2,
                                   lang_dim=24, fpn_dims=(32,))
    sd.update(_fake_reference_mask_transformer_sd(rng, mt_cfg))
    return sd


def test_pipeline_ok_on_well_formed(full_sd):
    p = vp.stage_port(dict(full_sd))
    assert p["status"] == "ok", p
    ported = p.pop("_ported_tree")
    rt = vp.stage_roundtrip(dict(full_sd), ported)
    assert rt["status"] == "ok", rt
    tp = vp.stage_torch_parity(dict(full_sd), ported,
                               enc_heads=2, dec_heads=2)
    assert tp["status"] == "ok", tp
    assert tp["modules"]["must3r_encoder"]["max_abs_diff"] < 1e-3
    assert tp["modules"]["must3r_decoder"]["max_abs_diff"] < 1e-2


def test_drifted_decoder_names_fail_loudly(full_sd):
    """`must3r_decoder.decoder.blocks.*` (drift) → port must FAIL with the
    drifted keys listed as unmapped + closest-match suggestions, not
    silently skip the decoder."""
    sd = {re.sub(r"^must3r_decoder\.dec_blocks\.",
                 "must3r_decoder.decoder.blocks.", k): v
          for k, v in full_sd.items()}
    p = vp.stage_port(sd)
    assert p["status"] in ("fail", "error")
    if p["status"] == "fail":
        assert p["unmapped_count"] > 0
        keys = [u["key"] for u in p["unmapped"]]
        assert any("decoder.blocks" in k for k in keys)
        # actionable: suggestions point at consumed keys
        sugg = [s for u in p["unmapped"] for s in u["closest_consumed"]]
        assert sugg, "no closest-match suggestions produced"
    else:
        err = p["error"]
        assert err["missing_key_candidates_tried"]
        assert any(err["closest_in_checkpoint"].values())


def test_missing_module_reported(full_sd):
    sd = {k: v for k, v in full_sd.items()
          if not k.startswith("dino_encoder.")}
    p = vp.stage_port(sd)
    assert p["missing_modules"], "dropped module not reported"
    assert p["missing_modules"][0]["expected_prefix"] == "dino_encoder."
    assert p["status"] != "ok"


def test_rename_json_bridges_drift(full_sd):
    sd = {re.sub(r"^must3r_decoder\.dec_blocks\.",
                 "must3r_decoder.decoder.blocks.", k): v
          for k, v in full_sd.items()}
    rename = {r"^must3r_decoder\.decoder\.blocks\.":
              "must3r_decoder.dec_blocks."}
    p = vp.stage_port(sd, rename=rename)
    assert p["status"] == "ok", p


def test_cli_end_to_end(tmp_path, full_sd):
    """main() on an .npz checkpoint writes verify_report.json with an
    overall verdict."""
    ckpt = tmp_path / "ckpt.npz"
    np.savez(ckpt, **full_sd)
    rep = vp.main(["--torch", str(ckpt), "--out", str(tmp_path / "rep"),
                   "--skip-torch-parity", "--skip-forward"])
    assert rep["verdict"] == "ok"
    on_disk = json.loads((tmp_path / "rep" / "verify_report.json")
                         .read_text())
    assert on_disk["verdict"] == "ok"
    assert (tmp_path / "rep" / "ported_params.npz").exists()
