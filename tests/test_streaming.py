"""StreamingDetector: ordered results, parity with the one-shot pipeline."""

import os

import jax.numpy as jnp

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.inference import Detector, StreamingDetector
from yolofastest_tpu.models import load_variables, zoo_path

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_streaming_matches_oneshot():
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    import jax.numpy as jnp

    cfg = get_config("256x320")
    variables = load_variables(zoo_path("256x320"))
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    frames = fx["pre_imgs"]  # (20, H, W) uint8

    stream = StreamingDetector(cfg, variables, compute_dtype=jnp.float32)
    batches = [frames[i:i + 4] for i in range(0, 20, 4)]
    outs = list(stream(batches))
    assert len(outs) == 5

    det = Detector(cfg, variables=variables)
    imgs = (frames.astype(np.float32)[..., None] - 128.0) / 255.0
    ref = det.run(jnp.asarray(imgs))
    ref = {k: np.asarray(v) for k, v in ref.items()}

    got_counts = np.concatenate([o["count"] for o in outs])
    np.testing.assert_array_equal(got_counts, ref["count"])
    got_boxes = np.concatenate([o["boxes"] for o in outs])
    for b in range(20):
        n = int(ref["count"][b])
        np.testing.assert_allclose(got_boxes[b, :n], ref["boxes"][b, :n], atol=1.0)


def test_streaming_fold_bn_matches_flax_graph():
    """fold_bn=True (the deployment graph bench uses) must produce the same
    detections as the flax-apply path."""
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    cfg = get_config("256x320")
    v = load_variables(zoo_path("256x320"))
    frames = [fx["pre_imgs"][:4]]
    a = list(StreamingDetector(cfg, v, compute_dtype=jnp.float32)(frames))[0]
    b = list(StreamingDetector(cfg, v, compute_dtype=jnp.float32,
                               fold_bn=True)(frames))[0]
    np.testing.assert_array_equal(a["count"], b["count"])
    np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1.0)


def test_streaming_threaded_matches_sync():
    """The threaded-uploader mode (device_put + dispatch on a worker) must
    yield identical detections in order — only scheduling differs."""
    import numpy as np

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import StreamingDetector
    from yolofastest_tpu.models import load_variables, zoo_path
    import os
    import pytest

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    cfg = get_config("256x320")
    variables = load_variables(zoo_path("256x320"))
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 256, (2, 256, 320), np.uint8)
               for _ in range(5)]
    sd = StreamingDetector(cfg, variables, fold_bn=True, depth=3)
    sync = list(sd(iter(batches)))
    sd.threaded = True
    thr = list(sd(iter(batches)))
    assert len(sync) == len(thr) == 5
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a["count"], b["count"])
        np.testing.assert_allclose(a["boxes"], b["boxes"])


def test_streaming_threaded_propagates_errors():
    import numpy as np
    import os
    import pytest

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import StreamingDetector
    from yolofastest_tpu.models import load_variables, zoo_path

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    cfg = get_config("256x320")
    sd = StreamingDetector(cfg, load_variables(zoo_path("256x320")),
                           fold_bn=True, depth=2, threaded=True)

    def bad_stream():
        yield np.zeros((2, 256, 320), np.uint8)
        raise RuntimeError("source died")

    with pytest.raises(RuntimeError, match="source died"):
        list(sd(bad_stream()))
