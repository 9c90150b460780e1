"""1D slab domain decomposition over a TPU device mesh.

TPU-native replacement for the reference's DMPlex.distribute() + PETSc
ownership-range partitioning (`src/domain/dmplex.py:21`, SURVEY §2.3): the
structured box is cut into equal slabs along grid axis 0 at element
boundaries. Neighboring slabs OVERLAP by one grid plane (the shared element
interface); the invariant is that both copies of an interface plane hold
identical values. An operator application is then entirely local followed by
one bidirectional `ppermute` exchange of interface-plane partial sums (the
ICI analog of PETSc's VecScatter-overlapped MatMult).

Every shard runs the same program on same-shaped data: the local sub-mesh has
identical connectivity/incidence tables on all shards (closure constants),
while coordinates, BC masks, and ownership masks are per-shard operands
stacked on a leading device axis.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from pynama_tpu.mesh.box import BoxMesh


@dataclasses.dataclass(frozen=True)
class SlabPartition:
    global_mesh: BoxMesh
    #: local sub-mesh (connectivity template; physical coords differ by shard)
    local_mesh: BoxMesh
    ndev: int
    #: local grid planes along axis 0 (including both interface planes)
    npx_loc: int
    #: nodes per grid plane (product of the remaining axes)
    plane: int
    #: (ndev, n_loc) global node id of each local node
    to_global: np.ndarray
    #: (ndev, n_loc, 1) 1.0 where this shard owns the node (counted once)
    owned: np.ndarray
    #: (ndev, n_loc, dim) local node coordinates
    coords: np.ndarray

    @property
    def n_loc(self) -> int:
        return self.npx_loc * self.plane

    def scatter(self, x_global: np.ndarray) -> np.ndarray:
        """(n_nodes, c) -> (ndev, n_loc, c) overlapping slab layout."""
        return np.asarray(x_global)[self.to_global]

    def gather(self, x_slab: np.ndarray) -> np.ndarray:
        """(ndev, n_loc, c) -> (n_nodes, c), reading owned entries only."""
        c = x_slab.shape[-1]
        out = np.zeros((self.global_mesh.n_nodes, c), dtype=x_slab.dtype)
        own = self.owned[..., 0] > 0
        for d in range(self.ndev):
            out[self.to_global[d][own[d]]] = np.asarray(x_slab[d])[own[d]]
        return out

    def scatter_mask(self, mask_global: np.ndarray) -> np.ndarray:
        """Slab-scatter a per-node mask/values array."""
        return self.scatter(mask_global)


def make_partition(mesh: BoxMesh, ndev: int) -> SlabPartition:
    if mesh.nelem[0] % ndev != 0:
        raise ValueError(
            f"nelem[0]={mesh.nelem[0]} not divisible by {ndev} devices")
    ex_loc = mesh.nelem[0] // ndev
    ngl = mesh.ngl
    npx_loc = ex_loc * (ngl - 1) + 1
    plane = int(np.prod(mesh.npts[1:]))

    # local template mesh: same connectivity on every shard
    local_nelem = (ex_loc,) + mesh.nelem[1:]
    # physical extent of slab 0 (geometry is uniform, so element matrices
    # computed from this template are valid on every shard)
    wx = (mesh.upper[0] - mesh.lower[0]) / ndev
    local_lower = mesh.lower
    local_upper = (mesh.lower[0] + wx,) + mesh.upper[1:]
    local_mesh = BoxMesh.create(ngl, local_nelem, local_lower, local_upper)

    to_global = np.empty((ndev, npx_loc * plane), dtype=np.int64)
    owned = np.zeros((ndev, npx_loc * plane, 1))
    coords = np.empty((ndev, npx_loc * plane, mesh.dim))
    for d in range(ndev):
        col0 = d * ex_loc * (ngl - 1)
        cols = col0 + np.arange(npx_loc)
        ids = (cols[:, None] * plane + np.arange(plane)[None, :]).ravel()
        to_global[d] = ids
        own = np.ones((npx_loc, plane))
        if d < ndev - 1:
            own[-1] = 0.0  # right interface plane owned by right neighbor's 0
        owned[d] = own.reshape(-1, 1)
        coords[d] = mesh.coords[ids]
    return SlabPartition(global_mesh=mesh, local_mesh=local_mesh, ndev=ndev,
                         npx_loc=npx_loc, plane=plane, to_global=to_global,
                         owned=owned, coords=coords)
