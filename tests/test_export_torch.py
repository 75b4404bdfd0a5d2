"""TorchScript interchange format: folded graph -> torch trace -> consumer.

The reference reaches external runtimes through torch artifacts
(``torch.jit.trace`` for RKNN, ``rknn_deploy.py:14-20``; ``torch.onnx`` for
ncnn, ``convert_model/pytorch_to_onnx.py:17-23``).  These tests lock our
equivalent: the exported ``.pt`` reproduces the JAX folded graph, and a
fresh process that imports ONLY torch + numpy (no JAX, no flax, no
yolofastest_tpu) reproduces the committed golden logits.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import build_torch_module, export_torchscript
from yolofastest_tpu.models import (
    YoloFastestLite,
    fold_batchnorm,
    folded_apply,
    folded_apply_lite,
    load_variables,
    zoo_path,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def setup():
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    variables = load_variables(zoo_path("256x320"))
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"][:4].astype(np.float32)[..., None] - 128.0) / 255.0
    return fold_batchnorm(variables), fx, imgs


def test_torch_module_matches_jax_folded(setup):
    folded, _, imgs = setup
    module = build_torch_module(folded)
    with torch.no_grad():
        t_large, t_small = module(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    j_large, j_small = jax.jit(folded_apply)(
        jax.tree.map(jnp.asarray, folded), jnp.asarray(imgs)
    )
    # torch returns NCHW; JAX graph is NHWC
    np.testing.assert_allclose(t_large.numpy(), np.asarray(j_large).transpose(0, 3, 1, 2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(t_small.numpy(), np.asarray(j_small).transpose(0, 3, 1, 2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.gate
def test_torchscript_consumed_by_torch_only_process(tmp_path, setup):
    """External-runtime story: load the .pt with nothing but torch, feed the
    golden preprocessed images, match the committed reference logits."""
    folded, fx, imgs = setup
    cfg = get_config("256x320")
    p = str(tmp_path / "model.pt")
    export_torchscript(folded, cfg.io.input_hw, p, batch=4)
    np.save(tmp_path / "imgs.npy", imgs.transpose(0, 3, 1, 2))

    script = tmp_path / "consume.py"
    script.write_text(textwrap.dedent(f"""
        import sys
        import numpy as np
        import torch

        m = torch.jit.load({p!r})
        imgs = torch.from_numpy(np.load({str(tmp_path / 'imgs.npy')!r}))
        with torch.no_grad():
            large, small = m(imgs)
        # NB: in this image `import torch` transitively imports jax via
        # opt_einsum's optional backend; the artifact itself is a pure
        # TorchScript graph, so the check is that OUR framework (and flax,
        # which only our framework pulls in) never loads.
        banned = [mod for mod in sys.modules
                  if "flax" in mod or "yolofastest" in mod]
        assert not banned, f"framework modules leaked in: {{banned}}"
        np.savez({str(tmp_path / 'out.npz')!r},
                 large=large.numpy(), small=small.numpy())
        print("CONSUMED_OK")
    """))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "CONSUMED_OK" in r.stdout

    out = np.load(tmp_path / "out.npz")
    # vs the committed golden logits (produced by the reference torch model,
    # already NCHW): BN folding costs < 1e-3, same bound as checkpoint parity
    np.testing.assert_allclose(out["large"], fx["logits_large"], atol=2e-3)
    np.testing.assert_allclose(out["small"], fx["logits_small"], atol=2e-3)


def test_torchscript_lite_arch(tmp_path):
    model = YoloFastestLite(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    module = build_torch_module(folded, arch="yolofastest-lite")
    x = np.random.default_rng(0).standard_normal((2, 64, 96, 1)).astype(np.float32)
    with torch.no_grad():
        t_out = module(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_out = folded_apply_lite(jax.tree.map(jnp.asarray, folded), jnp.asarray(x))
    # random-init activations reach |x| ~ 3e3; rtol dominated by fp32
    # accumulation-order differences between XLA and torch convs
    np.testing.assert_allclose(t_out.numpy(), np.asarray(j_out).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-3)

    p = str(tmp_path / "lite.pt")
    export_torchscript(folded, (64, 96), p, batch=2, arch="yolofastest-lite")
    re = torch.jit.load(p)
    with torch.no_grad():
        r_out = re(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(r_out.numpy(), t_out.numpy(), rtol=0, atol=0)
