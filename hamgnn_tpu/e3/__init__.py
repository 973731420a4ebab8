"""TPU-native O(3)-equivariant core: irreps algebra, Wigner machinery,
spherical harmonics, and compiled equivariant layers."""

from .irreps import Irrep, Irreps, MulIrrep, irreps2gate
from .wigner import wigner_3j, wigner_D, irreps_D, su2_clebsch_gordan
from .spherical import spherical_harmonics
