"""Export subsystem: AOT compilation/serialization and C++ code generation."""
from .aot import export_solver, load_solver, load_problem, save_problem
from .codegen_cpp import generate_cpp
