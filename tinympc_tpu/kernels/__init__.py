"""Pallas TPU kernels for the solver hot path."""
from .admm_pallas import solve_fused, fused_supported
from .closed_loop_pallas import closed_loop_fused
