"""Metric parity vs the reference implementation (source exec'd with stubs for its
missing deps: skimage -> scipy-backed label, torch.distributed -> no-ops)."""

import sys
import types

import numpy as np
import pytest

from maggie_tpu.utils import metrics as M

REF = "/root/reference/maggie/utils/metric.py"


@pytest.fixture(scope="module")
def ref():
    src = open(REF).read()
    src = src.replace("from .dist import synchronize, gather",
                      "synchronize = lambda: None\ngather = lambda x, dst=0: [x]")
    # joblib/multiprocessing can't pickle classes from an exec'd module; run inline
    src = src.replace("n_jobs=min(10, len(all_intersections))", "n_jobs=1")
    src = src.replace(
        "pool = Pool(B)",
        "pool = __import__('types').SimpleNamespace(imap=lambda f, it: map(f, it), close=lambda: None)")
    # stub skimage.measure.label with the scipy equivalent (4-connectivity)
    skimage = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")

    def label(x, connectivity=1, return_num=False):
        from scipy import ndimage
        s = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        cc, num = ndimage.label(x, structure=s)
        return (cc, num) if return_num else cc

    measure.label = label
    skimage.measure = measure
    saved = {k: sys.modules.get(k) for k in ("skimage", "skimage.measure")}
    sys.modules["skimage"] = skimage
    sys.modules["skimage.measure"] = measure
    mod = types.ModuleType("ref_metric")
    exec(compile(src, REF, "exec"), mod.__dict__)
    yield mod
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _maps(seed, *shape):
    rs = np.random.RandomState(seed)
    a = rs.rand(*shape).astype(np.float32)
    a[a < 0.3] = 0.0
    a[a > 0.8] = 1.0
    return a


def _trimap(seed, *shape):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 3, shape).astype(np.float32)


@pytest.mark.parametrize("name", ["MAD", "MSE", "SAD", "Grad"])
def test_image_metrics(ref, name):
    pred = _maps(0, 2, 3, 48, 48)
    gt = _maps(1, 2, 3, 48, 48)
    tri = _trimap(2, 2, 3, 48, 48)
    r = getattr(ref, name)()
    kw = {"device": "cpu"} if name == "Grad" else {}
    want = r.update(pred, gt, trimap=tri, **kw)
    m = M.build_metric([name])[name]
    got = m.update(pred, gt, trimap=tri)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(m.average(), r.average(), rtol=1e-5)


def test_conn(ref):
    pred = _maps(3, 1, 2, 32, 32)
    gt = _maps(4, 1, 2, 32, 32)
    tri = _trimap(5, 1, 2, 32, 32)
    want = ref.Conn().update(pred, gt, trimap=tri)
    got = M.build_metric(["Conn"])["Conn"].update(pred, gt, trimap=tri)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dtssd(ref):
    pred = _maps(6, 4, 2, 24, 24)  # (n_f, n_i, h, w)
    gt = _maps(7, 4, 2, 24, 24)
    tri = _trimap(8, 4, 2, 24, 24)
    want = ref.dtSSD().update(pred, gt, trimap=tri)
    got = M.build_metric(["dtSSD"])["dtSSD"].update(pred, gt, trimap=tri)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_messddt(ref):
    pred = _maps(9, 3, 1, 40, 40)
    gt = _maps(10, 3, 1, 40, 40)
    tri = _trimap(11, 3, 1, 40, 40)
    want = ref.MESSDdt().update(pred, gt, trimap=tri)
    got = M.build_metric(["MESSDdt"])["MESSDdt"].update(pred, gt, trimap=tri)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mad_region_variants():
    pred = _maps(12, 2, 2, 16, 16)
    gt = _maps(13, 2, 2, 16, 16)
    tri = _trimap(14, 2, 2, 16, 16)
    for name, val in [("MAD_fg", 2), ("MAD_bg", 0), ("MAD_unk", 1)]:
        m = M.build_metric([name])[name]
        got = m.update(pred, gt, trimap=tri)
        base = M.MAD()
        mask = (tri == val).astype(np.float32)
        diff = np.abs(pred - gt).reshape(-1, 16, 16) * mask.reshape(-1, 16, 16)
        want = (np.mean(diff, axis=(1, 2)) / (mask.reshape(-1, 16, 16).sum(axis=(1, 2)) + 1e-6)).sum() * 1e10 / mask.reshape(-1, 16, 16).shape[0]
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_parallel_metrics_match_serial(monkeypatch):
    """The threaded host-metric path (_parallel_map) must be bit-identical to
    the serial loop: the per-item work is independent and the combines are
    ordered. Forced to 4 workers regardless of host core count."""
    pred = _maps(21, 4, 2, 48, 48)
    gt = _maps(22, 4, 2, 48, 48)
    tri = _trimap(23, 4, 2, 48, 48)

    def run():
        out = {}
        for name in ("Grad", "Conn", "MESSDdt"):
            m = M.build_metric([name])[name]
            out[name] = m.update(pred, gt, trimap=tri)
        return out

    monkeypatch.setenv("MAGGIE_METRIC_WORKERS", "1")
    serial = run()
    monkeypatch.setenv("MAGGIE_METRIC_WORKERS", "4")
    parallel = run()
    for name, want in serial.items():
        np.testing.assert_array_equal(parallel[name], want, err_msg=name)
