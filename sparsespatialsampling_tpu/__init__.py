"""sparsespatialsampling_tpu — TPU-native sparse spatial sampling (S³).

A ground-up JAX/XLA/Pallas re-design of the S³ CFD data-reduction pipeline
(reference: JanisGeise/sparseSpatialSampling): metric-driven adaptive
quadtree/octree grid generation, snapshot interpolation, HDF5/XDMF export,
and weighted SVD analysis — with the hot numerics (k-NN, geometry masking,
interpolation, SVD) on the accelerator and a drop-in-compatible public API
and file schema.
"""
from .version import __version__
from .sparse_spatial_sampling import SparseSpatialSampling, list_geometries, load_s_cube
from .export import ExportData, Fields
from .io import Dataloader, Datawriter, XDMFWriter
from .utils import (compute_svd, compute_dmd, write_svd_s_cube_to_file,
                    load_foam_data, load_original_Foam_fields,
                    export_openfoam_fields)
from .geometry import (GeometryObject, CubeGeometry, SphereGeometry, CylinderGeometry3D,
                       TriangleGeometry, PrismGeometry3D, TetrahedronGeometry3D,
                       PyramidGeometry3D, GeometryCoordinates2D, GeometrySTL3D)

__all__ = [
    "__version__",
    "SparseSpatialSampling", "list_geometries", "load_s_cube",
    "ExportData", "Fields",
    "Dataloader", "Datawriter", "XDMFWriter",
    "compute_svd", "compute_dmd", "write_svd_s_cube_to_file", "load_foam_data",
    "load_original_Foam_fields", "export_openfoam_fields",
    "GeometryObject", "CubeGeometry", "SphereGeometry", "CylinderGeometry3D",
    "TriangleGeometry", "PrismGeometry3D", "TetrahedronGeometry3D",
    "PyramidGeometry3D", "GeometryCoordinates2D", "GeometrySTL3D",
]
