"""Shared test utilities: golden-file loading and closed-loop harnesses."""
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

GOLDEN = Path(__file__).parent / "golden"


def load_golden(name: str) -> dict:
    with open(GOLDEN / f"{name}.json") as f:
        return json.load(f)


def golden_cache(g: dict) -> dict:
    return {k: np.asarray(v) for k, v in g["cache"].items()}


def steps_array(g: dict, key: str) -> np.ndarray:
    return np.asarray([s[key] for s in g["steps"]])


def assert_cache_close(cache, gc, atol=1e-8):
    np.testing.assert_allclose(cache.Kinf, gc["Kinf"], atol=atol, err_msg="Kinf")
    np.testing.assert_allclose(cache.Pinf, gc["Pinf"], atol=atol, err_msg="Pinf")
    np.testing.assert_allclose(cache.Quu_inv, gc["Quu_inv"], atol=atol, err_msg="Quu_inv")
    np.testing.assert_allclose(cache.AmBKt, gc["AmBKt"], atol=atol, err_msg="AmBKt")
    np.testing.assert_allclose(cache.APf, gc["APf"], atol=atol, err_msg="APf")
    np.testing.assert_allclose(cache.BPf, gc["BPf"], atol=atol, err_msg="BPf")
