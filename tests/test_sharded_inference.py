"""Multi-chip inference: the detect pipeline sharded over a device mesh.

Serving scale-out story: batch-parallel detection over ``P('data')`` with
replicated weights — XLA partitions the whole fused pipeline (preprocess,
backbone, decode, NMS) with zero code changes.  Runs on the virtual 8-device
CPU mesh (conftest).
"""

import os

import numpy as np
import pytest


def test_detect_pipeline_shards_over_mesh():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.models import YoloFastest, load_variables, zoo_path
    from yolofastest_tpu.ops import batched_nms, decode_heads, normalize

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = get_config("256x320")
    io = cfg.io
    mesh = Mesh(np.array(devs[:8]), ("data",))
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))

    variables = jax.device_put(
        jax.tree.map(jnp.asarray, load_variables(zoo_path("256x320"))), replicated
    )
    model = YoloFastest(num_cls=io.num_cls, num_anchors=io.num_anchors)

    @jax.jit
    def pipeline(variables, frames):
        imgs = normalize(frames, jnp.float32)[..., None]
        heads = model.apply(variables, imgs, train=False)
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_256x320.npz"))
    frames = np.concatenate([fx["pre_imgs"][:16]])  # 16 images over 8 devices
    frames = jax.device_put(jnp.asarray(frames), batch_sharded)

    det = pipeline(variables, frames)
    assert det["boxes"].sharding.spec == P("data")

    # results must equal the single-device run
    det_host = jax.tree.map(np.asarray, det)
    frames1 = jnp.asarray(fx["pre_imgs"][:16])
    det1 = jax.tree.map(np.asarray, pipeline(variables, frames1))
    np.testing.assert_array_equal(det_host["count"], det1["count"])
    np.testing.assert_allclose(det_host["boxes"], det1["boxes"], atol=1e-4)


def test_detect_pipeline_spatial_sharding():
    """Large-image serving: shard batch AND image rows over a (4, 2) mesh —
    GSPMD inserts the conv halo exchanges; detections must be identical."""
    import jax
    import jax.numpy as jnp

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.models import YoloFastest, load_variables, zoo_path
    from yolofastest_tpu.ops import batched_nms, decode_heads, normalize
    from yolofastest_tpu.parallel import batch_sharding, make_mesh, replicate

    if not os.path.exists(zoo_path("512x640")):
        pytest.skip("zoo weights not present")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = get_config("512x640")
    io = cfg.io
    mesh = make_mesh(n_data=4, n_spatial=2)
    variables = jax.device_put(
        jax.tree.map(jnp.asarray, load_variables(zoo_path("512x640"))),
        replicate(mesh),
    )
    model = YoloFastest(num_cls=io.num_cls, num_anchors=io.num_anchors)

    @jax.jit
    def pipeline(variables, frames):
        imgs = normalize(frames, jnp.float32)[..., None]
        heads = model.apply(variables, imgs, train=False)
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    fx = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_512x640.npz"))
    frames = fx["pre_imgs"][:4]
    sharded = jax.device_put(jnp.asarray(frames),
                             batch_sharding(mesh, spatial=True))
    det_s = jax.tree.map(np.asarray, pipeline(variables, sharded))
    det_1 = jax.tree.map(np.asarray, pipeline(variables, jnp.asarray(frames)))
    np.testing.assert_array_equal(det_s["count"], det_1["count"])
    np.testing.assert_allclose(det_s["boxes"], det_1["boxes"], atol=1e-3)
