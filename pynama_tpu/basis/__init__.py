from pynama_tpu.basis.quadrature import gauss_points, lobatto_points
from pynama_tpu.basis.lagrange import lagrange_basis
from pynama_tpu.basis.tables import Basis1D, TensorBasis, make_tensor_basis
