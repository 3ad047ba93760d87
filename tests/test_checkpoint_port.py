"""Full checkpoint-port round trip: reference torch model -> .pt file on
disk -> load_torch_checkpoint -> convert -> logit parity, plus npz
round trip — the exact workflow a user follows to port a published
checkpoint (README 'Checkpoints')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.models import PaSSTConfig
from passt_tpu.models.passt import PaSST, init_passt
from passt_tpu.models.pretrained import (
    load_params_npz,
    load_pretrained_params,
    load_torch_checkpoint,
    save_params_npz,
)

from reference_oracle import load_reference_passt_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference oracle unavailable"
)


@pytest.mark.slow
def test_pt_file_port_round_trip(tmp_path, rng_np):
    import torch

    ref_passt = load_reference_passt_module()
    torch.manual_seed(3)
    ref = ref_passt.PaSST(
        img_size=(128, 198), patch_size=16, stride=(10, 10), in_chans=1,
        num_classes=527, distilled=True, depth=2, embed_dim=192, num_heads=3,
    )
    ref.eval()
    pt_path = str(tmp_path / "ckpt.pt")
    torch.save(ref.state_dict(), pt_path)

    cfg = PaSSTConfig(
        input_tdim=198, num_classes=527, depth=2, embed_dim=192, num_heads=3
    )
    model, init_params = init_passt(cfg, jax.random.PRNGKey(0))
    params = load_pretrained_params(pt_path, cfg, init_params)

    x = rng_np.standard_normal((1, 1, 128, 198)).astype(np.float32)
    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(x))
    logits, _ = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-4)

    # npz save/load round trip preserves everything bit-exactly.
    npz_path = str(tmp_path / "ported.npz")
    save_params_npz(npz_path, params)
    params2 = load_pretrained_params(npz_path, cfg, init_params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pt_with_state_dict_wrapper(tmp_path):
    """PL training checkpoints wrap weights in {'state_dict': ...}."""
    import torch

    ref_passt = load_reference_passt_module()
    torch.manual_seed(4)
    ref = ref_passt.PaSST(
        img_size=(128, 198), patch_size=16, stride=(10, 10), in_chans=1,
        num_classes=10, distilled=True, depth=1, embed_dim=64, num_heads=2,
    )
    pt_path = str(tmp_path / "wrapped.pt")
    torch.save({"state_dict": ref.state_dict(), "epoch": 7}, pt_path)
    sd = load_torch_checkpoint(pt_path)
    assert "cls_token" in sd and sd["cls_token"].shape == (1, 1, 64)


def test_port_checkpoint_script_dry_run(tmp_path, monkeypatch):
    """scripts/port_checkpoint.py end-to-end on a synthetic reference .pt:
    the push-button runbook path (PARITY.md) minus the real download."""
    import dataclasses
    import sys

    import torch

    sys.path.insert(0, "/root/repo/scripts")
    import passt_tpu.models.registry as registry
    import port_checkpoint

    arch = "passt_s_swa_p16_128_ap476"
    monkeypatch.setitem(
        registry.ARCHS,
        arch,
        dataclasses.replace(registry.ARCHS[arch], depth=2, embed_dim=192, num_heads=3),
    )
    ref_passt = load_reference_passt_module()
    torch.manual_seed(5)
    ref = ref_passt.PaSST(
        img_size=(128, 998), patch_size=16, stride=(10, 10), in_chans=1,
        num_classes=527, distilled=True, depth=2, embed_dim=192, num_heads=3,
    )
    pt_path = str(tmp_path / "synthetic.pt")
    torch.save(ref.state_dict(), pt_path)
    out_npz = str(tmp_path / "ported" / "ap476.npz")

    rc = port_checkpoint.main([pt_path, out_npz, "--arch", arch])
    assert rc == 0

    # the ported npz evaluates through the public command surface
    cfg = PaSSTConfig(num_classes=527, depth=2, embed_dim=192, num_heads=3)
    model, init_params = init_passt(cfg, jax.random.PRNGKey(0))
    params = load_pretrained_params(out_npz, cfg, init_params)
    x = np.random.default_rng(0).standard_normal((1, 1, 128, 998)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(x))
    logits, _ = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-4)
