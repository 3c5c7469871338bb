"""Pallas TPU kernels for the solver hot path."""
from .admm_pallas import (FusedCarry, adapted_cache, fused_supported,
                          init_carry, max_tile, shift_carry, solve_fused,
                          solve_fused_multi,
                          solve_fused_warm)
from .admm_stream import (solve_fused_streamed, solve_fused_streamed_warm,
                          stream_supported)
from .closed_loop_pallas import closed_loop_fused
from .compact import make_compact_solver, solve_fused_compact
from .fleet import make_fleet_solver, solve_fused_fleet
