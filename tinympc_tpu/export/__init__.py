"""Export subsystem: AOT compilation/serialization, C++ code generation,
and prebuilt shared-library deployment (the libtinympc.so analog)."""
from .aot import export_solver, load_solver, load_problem, save_problem
from .codegen_cpp import generate_cpp
from .embedded import EmbeddedSolver, EmbeddedSolution, build_shared_library
