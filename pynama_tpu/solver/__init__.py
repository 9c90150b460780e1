from pynama_tpu.solver.cg import pcg
from pynama_tpu.solver.gmres import gmres
from pynama_tpu.solver.kle import KLESolver
from pynama_tpu.solver.timestep import BS5, adaptive_solve
