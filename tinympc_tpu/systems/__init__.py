"""Benchmark / example systems.

The same numeric fixtures the reference ships (examples/problem_data/*.hpp,
examples/trajectory_data/*.hpp), exposed as numpy arrays. Each accessor
returns a dict with keys A (nx,nx), B (nx,nu), f (nx,), Qdiag (nx,),
Rdiag (nu,), rho — the arguments of :func:`tinympc_tpu.setup`.
"""
from __future__ import annotations

import numpy as np

from ._data import SYSTEMS, TRAJECTORIES


def _system(name: str) -> dict:
    d = SYSTEMS[name]
    nx, nu = d["nx"], d["nu"]
    return dict(
        A=np.asarray(d["A"], np.float64).reshape(nx, nx),
        B=np.asarray(d["B"], np.float64).reshape(nx, nu),
        f=np.asarray(d.get("f", [0.0] * nx), np.float64),
        Qdiag=np.asarray(d["Q"], np.float64),
        Rdiag=np.asarray(d["R"], np.float64),
        rho=d["rho"],
    )


def cartpole() -> dict:
    """4-state cart-pole (reference examples/cartpole_example.cpp:34-37)."""
    return dict(
        A=np.array([[1.0, 0.01, 0.0, 0.0],
                    [0.0, 1.0, 0.039, 0.0],
                    [0.0, 0.0, 1.002, 0.01],
                    [0.0, 0.0, 0.458, 1.002]]),
        B=np.array([[0.0], [0.02], [0.0], [0.067]]),
        f=np.zeros(4),
        Qdiag=np.array([10.0, 1.0, 10.0, 1.0]),
        Rdiag=np.array([1.0]),
        rho=1.0,
    )


def quadrotor_20hz() -> dict:
    """Crazyflie quadrotor, 20 Hz discretisation (quadrotor_20hz_params.hpp)."""
    return _system("quadrotor_20hz")


def quadrotor_50hz() -> dict:
    return _system("quadrotor_50hz")


def quadrotor_100hz() -> dict:
    return _system("quadrotor_100hz")


def rocket_landing_20hz() -> dict:
    """6-state rocket soft-landing with gravity affine term
    (rocket_landing_params_20hz.hpp)."""
    return _system("rocket_landing_20hz")


def synthetic(nx: int, nu: int, seed: int = 0, spectral_radius: float = 0.98,
              coupling: float = 0.3) -> dict:
    """Stable random linear system of arbitrary dimension — for scaling
    studies beyond the reference's fixed fixtures (state-dimension
    rooflines, horizon-parallel regime measurements). Deterministic in
    ``seed``. A = scaled random perturbation of I (spectral radius
    ``spectral_radius``, so rollouts neither blow up nor die), B random
    with columns reaching every state through the coupling."""
    rng = np.random.default_rng(seed)
    M = np.eye(nx) + coupling * rng.standard_normal((nx, nx)) / np.sqrt(nx)
    eig = np.max(np.abs(np.linalg.eigvals(M)))
    A = M * (spectral_radius / eig)
    B = rng.standard_normal((nx, nu)) / np.sqrt(nx)
    return dict(
        A=A, B=B, f=np.zeros(nx),
        Qdiag=np.full(nx, 10.0), Rdiag=np.ones(nu), rho=5.0,
    )


def trajectory(name: str, nx: int = 12) -> np.ndarray:
    """Reference trajectory as (T, nx) (examples/trajectory_data/*.hpp)."""
    return np.asarray(TRAJECTORIES[name], np.float64).reshape(-1, nx)


def crazyflie_sensitivity_tables():
    """The reference's hard-coded 12x4 quadrotor d/drho tables
    (tiny_api.cpp:489-531) as (dKinf, dPinf, dC1, dC2) — for bit-parity with
    reference adaptive-rho runs. For any other system use
    :func:`tinympc_tpu.riccati.compute_sensitivities` (autodiff)."""
    d = SYSTEMS["crazyflie_sensitivity"]
    return tuple(
        np.asarray(d[k], np.float64)
        for k in ("dKinf_drho", "dPinf_drho", "dC1_drho", "dC2_drho")
    )
