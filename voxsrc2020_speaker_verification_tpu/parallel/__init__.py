from .sharding import (  # noqa: F401
    make_mesh, param_shardings, batch_spec, MESH_DATA, MESH_MODEL,
)
