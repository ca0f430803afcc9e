"""Caffe SSD executor parity (the reference's face-detector backend,
scripts/morph_v2.py:156-175).

cv2 5.0 in this environment removed ``cv2.dnn.readNetFromCaffe`` (the
reference's own loader would fail here too), so the oracle is an
INDEPENDENT torch reconstruction of the graph: every Caffe layer re-derived
with torch ops in this test (different framework, different layouts —
catches transposes, padding and stats bugs). PriorBox ordering and the
CENTER_SIZE decode are additionally checked against hand-computed values
from the Caffe SSD layer definitions.

Random weights are synthesized for the REAL deploy.prototxt (the shipped
caffemodel is stripped), serialized by io/caffe.py's writer, and read back.
"""

from pathlib import Path

import numpy as np
import pytest

PROTOTXT = Path("/root/reference/models/face_detector/deploy.prototxt")


def _blob_shapes_from_prototxt(net):
    """Walk the graph host-side to derive every weighted layer's blob shapes."""
    from neuralstyletransferv1_tpu.models.caffe_ssd import _bool1, _int1

    shapes = {}
    channels = {net.one("input", "data"): int(net.one("input_shape").many("dim")[1])}
    for l in net.many("layer"):
        ltype = l.one("type")
        name = l.one("name")
        bots = l.many("bottom")
        tops = l.many("top")
        cin = channels.get(bots[0]) if bots else None
        if ltype == "Convolution":
            cp = l.one("convolution_param")
            cout = _int1(cp, "num_output", 1)
            k = _int1(cp, "kernel_size", 1)
            blobs = [(cout, cin, k, k)]
            if _bool1(cp, "bias_term", True):
                blobs.append((cout,))
            shapes[name] = blobs
            channels[tops[0]] = cout
        elif ltype == "BatchNorm":
            shapes[name] = [(cin,), (cin,), (1,)]
            channels[tops[0]] = cin
        elif ltype == "Scale":
            sp = l.one("scale_param")
            blobs = [(cin,)]
            if _bool1(sp, "bias_term", False):
                blobs.append((cin,))
            shapes[name] = blobs
            channels[tops[0]] = cin
        elif ltype == "Normalize":
            shapes[name] = [(cin,)]
            channels[tops[0]] = cin
        elif ltype == "Concat":
            channels[tops[0]] = sum(channels.get(b, 0) for b in bots)
        elif tops:
            channels[tops[0]] = cin
    return shapes


@pytest.fixture(scope="module")
def synthetic_model(tmp_path_factory):
    if not PROTOTXT.exists():
        pytest.skip("reference prototxt unavailable")
    from neuralstyletransferv1_tpu.io import caffe as cio

    net = cio.load_prototxt(PROTOTXT)
    shapes = _blob_shapes_from_prototxt(net)
    types = {l.one("name"): l.one("type") for l in net.many("layer")}
    rng = np.random.default_rng(42)
    blobs = {}
    for name, blobshapes in shapes.items():
        arrs = []
        for i, s in enumerate(blobshapes):
            if types[name] == "BatchNorm":
                if i == 0:
                    arrs.append(rng.normal(0, 0.2, s).astype(np.float32))
                elif i == 1:
                    arrs.append(rng.uniform(0.5, 1.5, s).astype(np.float32))
                else:
                    arrs.append(np.full(s, 2.0, np.float32))  # scale_factor ≠ 1
            elif types[name] in ("Scale", "Normalize"):
                arrs.append(rng.uniform(0.5, 1.5, s).astype(np.float32))
            else:
                fan_in = int(np.prod(s[1:])) if len(s) > 1 else 1
                arrs.append(rng.normal(0, 1.0 / np.sqrt(fan_in), s).astype(np.float32))
        blobs[name] = arrs
    model_path = tmp_path_factory.mktemp("caffe") / "synthetic.caffemodel"
    cio.write_caffemodel(model_path, blobs, types)
    return model_path, blobs


def test_caffemodel_roundtrip(synthetic_model):
    from neuralstyletransferv1_tpu.io import caffe as cio

    model_path, blobs = synthetic_model
    loaded = cio.load_caffemodel(model_path)
    assert set(loaded) == set(blobs)
    for name in blobs:
        for a, b in zip(blobs[name], loaded[name]):
            np.testing.assert_array_equal(a, np.asarray(b))


def _torch_trunk(torch, net, blobs, x_np):
    """Independent torch re-execution of the Caffe graph (the oracle)."""
    import torch.nn.functional as F

    from neuralstyletransferv1_tpu.models.caffe_ssd import _bool1, _int1, _ints

    t = {net.one("input", "data"): torch.from_numpy(x_np)}
    heads = {}
    for l in net.many("layer"):
        ltype = l.one("type")
        name = l.one("name")
        bots = l.many("bottom")
        tops = l.many("top")
        if ltype in ("PriorBox", "DetectionOutput"):
            continue
        if bots and any(bn not in t for bn in bots):
            continue  # prior-box-only subgraph
        b0 = t[bots[0]] if bots else None
        w = [torch.from_numpy(np.asarray(a)) for a in blobs.get(name, [])]
        if ltype == "Convolution":
            cp = l.one("convolution_param")
            bias = w[1] if _bool1(cp, "bias_term", True) and len(w) > 1 else None
            y = F.conv2d(b0, w[0], bias, stride=_int1(cp, "stride", 1),
                         padding=_int1(cp, "pad", 0),
                         dilation=_int1(cp, "dilation", 1))
        elif ltype == "BatchNorm":
            sf = float(w[2].ravel()[0])
            inv = 1.0 / sf if sf != 0 else 0.0
            m = (w[0] * inv).view(1, -1, 1, 1)
            v = (w[1] * inv).view(1, -1, 1, 1)
            y = (b0 - m) / torch.sqrt(v + 1e-5)
        elif ltype == "Scale":
            sp = l.one("scale_param")
            y = b0 * w[0].view(1, -1, 1, 1)
            if _bool1(sp, "bias_term", False) and len(w) > 1:
                y = y + w[1].view(1, -1, 1, 1)
        elif ltype == "ReLU":
            y = F.relu(b0)
        elif ltype == "Pooling":
            pp = l.one("pooling_param")
            y = F.max_pool2d(b0, _int1(pp, "kernel_size", 2),
                             _int1(pp, "stride", 1), ceil_mode=True)
        elif ltype == "Eltwise":
            y = sum(t[bn] for bn in bots)
        elif ltype == "Normalize":
            norm = torch.sqrt((b0 * b0).sum(dim=1, keepdim=True) + 1e-10)
            y = b0 / norm * w[0].view(1, -1, 1, 1)
        elif ltype == "Permute":
            y = b0.permute(*_ints(l.one("permute_param"), "order", [0, 1, 2, 3]))
        elif ltype == "Flatten":
            y = b0.reshape(b0.shape[0], -1)
        elif ltype == "Concat":
            y = torch.cat([t[bn] for bn in bots],
                          dim=_int1(l.one("concat_param"), "axis", 1))
        elif ltype == "Reshape":
            dims = _ints(l.one("reshape_param").one("shape"), "dim")
            y = b0.reshape([b0.shape[i] if d == 0 else d for i, d in enumerate(dims)])
        elif ltype == "Softmax":
            y = F.softmax(b0, dim=_int1(l.one("softmax_param"), "axis", 1))
        else:
            raise NotImplementedError(ltype)
        t[tops[0]] = y
    return t


def test_trunk_parity_vs_torch(synthetic_model):
    torch = pytest.importorskip("torch")
    from neuralstyletransferv1_tpu.io import caffe as cio
    from neuralstyletransferv1_tpu.models.caffe_ssd import load_caffe_ssd

    model_path, blobs = synthetic_model
    net = cio.load_prototxt(PROTOTXT)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 50, (1, 3, 300, 300)).astype(np.float32)

    with torch.no_grad():
        t = _torch_trunk(torch, net, blobs, x)

    ours = load_caffe_ssd(PROTOTXT, model_path)
    heads = {k: np.asarray(v) for k, v in ours.trunk(x).items()}

    for key, tname in (("__loc__", "mbox_loc"), ("__conf__", "mbox_conf_flatten")):
        want = t[tname].numpy()
        got = heads[key]
        assert got.shape == want.shape, (key, got.shape, want.shape)
        mae = np.abs(got - want).mean()
        scale = np.abs(want).mean() + 1e-9
        assert mae / scale < 1e-3, (key, mae, scale)


def test_priorbox_hand_values():
    """1×1 feature, 300×300 image, min 30 / max 60 / ar 2 flip — vs hand
    math from the Caffe SSD PriorBoxLayer definition."""
    from neuralstyletransferv1_tpu.io.caffe import parse_prototxt
    from neuralstyletransferv1_tpu.models.caffe_ssd import prior_boxes

    pp = parse_prototxt(
        "min_size: 30.0 max_size: 60.0 aspect_ratio: 2 flip: true clip: false "
        "variance: 0.1 variance: 0.1 variance: 0.2 variance: 0.2 "
        "step: 300 offset: 0.5"
    )
    out = prior_boxes((1, 1), (300, 300), pp)
    boxes = out[0].reshape(-1, 4) * 300.0
    s, m = 30.0, np.sqrt(30.0 * 60.0)
    w2, h2 = 30 * np.sqrt(2), 30 / np.sqrt(2)
    want = np.array([
        [150 - s / 2, 150 - s / 2, 150 + s / 2, 150 + s / 2],
        [150 - m / 2, 150 - m / 2, 150 + m / 2, 150 + m / 2],
        [150 - w2 / 2, 150 - h2 / 2, 150 + w2 / 2, 150 + h2 / 2],
        [150 - h2 / 2, 150 - w2 / 2, 150 + h2 / 2, 150 + w2 / 2],
    ], np.float32)
    np.testing.assert_allclose(boxes, want, atol=1e-3)
    var = out[1].reshape(-1, 4)
    np.testing.assert_allclose(var, np.tile([0.1, 0.1, 0.2, 0.2], (4, 1)), atol=1e-7)


def test_decode_hand_values():
    """CENTER_SIZE decode of one prior against hand math."""
    from neuralstyletransferv1_tpu.models.caffe_ssd import decode_detections

    prior = np.array([0.4, 0.4, 0.6, 0.6], np.float32)  # pw=ph=0.2, c=(0.5,0.5)
    var = np.array([0.1, 0.1, 0.2, 0.2], np.float32)
    loc = np.array([1.0, -1.0, 0.5, 0.0], np.float32)
    conf = np.array([0.3, 0.7], np.float32)
    priors = np.stack([prior, var], 0)
    det = decode_detections(loc, conf, priors)
    assert det.shape == (1, 7)
    cx = 0.1 * 1.0 * 0.2 + 0.5
    cy = 0.1 * -1.0 * 0.2 + 0.5
    w = np.exp(0.2 * 0.5) * 0.2
    h = 0.2
    np.testing.assert_allclose(det[0, 2], 0.7, atol=1e-6)
    np.testing.assert_allclose(
        det[0, 3:], [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], atol=1e-6
    )


def test_nms_suppresses_overlaps():
    from neuralstyletransferv1_tpu.models.caffe_ssd import _nms

    boxes = np.array([
        [0.1, 0.1, 0.5, 0.5],
        [0.12, 0.12, 0.52, 0.52],  # heavy overlap with 0
        [0.6, 0.6, 0.9, 0.9],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = _nms(boxes, scores, 0.45, 400)
    assert keep == [0, 2]


def test_detect_faces_api(synthetic_model, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.models.caffe_ssd import detect_faces

    model_path, _ = synthetic_model
    rng = np.random.default_rng(1)
    img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img)
    faces = detect_faces(p, PROTOTXT, model_path, confidence_threshold=0.0)
    for f in faces:
        assert set(f) == {"id", "bbox", "center", "area", "coverage",
                          "confidence", "aspect_ratio"}
        x, y, w, h = f["bbox"]
        assert 0 <= x <= 160 and 0 <= y <= 120 and w > 0 and h > 0
