"""Loss parity vs the reference implementation, loaded directly from its source file
(it only depends on torch + math, so we exec it in a scratch module namespace)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from maggie_tpu.models import losses as L

REF_LOSS = "/root/reference/maggie/network/loss.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_loss", REF_LOSS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand(seed, *shape):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_dtssd(ref):
    pred = _rand(0, 2, 3, 4, 16, 16)
    gt = _rand(1, 2, 3, 4, 16, 16)
    mask = (_rand(2, 2, 3, 4, 16, 16) > 0.5).astype(np.float32)
    want = ref.loss_dtSSD(torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask)).item()
    got = float(L.loss_dtssd(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gradient_loss_masked(ref):
    logit = _rand(3, 2, 5, 32, 32)
    label = _rand(4, 2, 5, 32, 32)
    mask = (_rand(5, 2, 5, 32, 32) > 0.4).astype(np.float32)
    gl = ref.GradientLoss()
    want = gl(torch.from_numpy(logit), torch.from_numpy(label), torch.from_numpy(mask)).item()
    got = float(L.gradient_loss(jnp.asarray(logit), jnp.asarray(label), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_gradient_loss_unmasked(ref):
    logit = _rand(6, 2, 3, 24, 24)
    label = _rand(7, 2, 3, 24, 24)
    gl = ref.GradientLoss()
    want = gl(torch.from_numpy(logit), torch.from_numpy(label)).item()
    got = float(L.gradient_loss(jnp.asarray(logit), jnp.asarray(label)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_lap_loss(ref):
    # LapLoss upsample assumes square inputs (reference loss.py:134-141)
    inp = _rand(8, 6, 1, 64, 64)
    tgt = _rand(9, 6, 1, 64, 64)
    wgt = (_rand(10, 6, 1, 64, 64) > 0.3).astype(np.float32)
    ll = ref.LapLoss(channels=1)
    want = ll(torch.from_numpy(inp), torch.from_numpy(tgt), torch.from_numpy(wgt)).item()
    got = float(L.lap_loss(jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(wgt)))
    np.testing.assert_allclose(got, want, rtol=2e-4)

    want_nw = ll(torch.from_numpy(inp), torch.from_numpy(tgt)).item()
    got_nw = float(L.lap_loss(jnp.asarray(inp), jnp.asarray(tgt)))
    np.testing.assert_allclose(got_nw, want_nw, rtol=2e-4)


def test_regression_loss():
    logit = _rand(11, 4, 3, 16, 16)
    target = _rand(12, 4, 3, 16, 16)
    weight = (_rand(13, 4, 3, 16, 16) > 0.5).astype(np.float32)
    lt, tt, wt = map(torch.from_numpy, (logit, target, weight))
    want = (torch.nn.functional.l1_loss(lt * wt, tt * wt, reduction="none").sum()
            / (wt.sum() + 1e-8)).item()
    got = float(L.regression_loss(jnp.asarray(logit), jnp.asarray(target), "l1", jnp.asarray(weight)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
