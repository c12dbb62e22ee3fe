"""dolfinx_external_operator_tpu — a TPU-native external-operator FEM framework.

A from-scratch rebuild of the capabilities of
``a-latyshev/dolfinx-external-operator`` on JAX/XLA/Pallas: symbolic forms
with external-operator nodes and form-level AD, quadrature-point operand
interpolation, batched constitutive kernels (vmapped local Newton solves with
``jax.jacfwd`` consistent tangents), jitted assembly, Newton–Krylov solvers,
and cell-axis sharding over TPU device meshes.

Public API parity with the reference package's 8 exports
(``src/dolfinx_external_operator/__init__.py:10-19``):
``DualSpace``, ``FEMExternalOperator``, ``FunctionSpace``,
``evaluate_external_operators``, ``evaluate_operands``, ``functionspace``,
``petsc`` (solver shim), ``replace_external_operators`` — plus the FEM
substrate (mesh/elements/forms/assembly/solvers) that the reference gets
from DOLFINx/UFL/Basix/PETSc.
"""

import jax as _jax

# Full double precision everywhere: the parity target is 1e-10 vs the
# reference tutorial suite (BASELINE.md).  f64 on TPU is emulated but
# supported for every op we lower to (LU is avoided; see solvers.py).
_jax.config.update("jax_enable_x64", True)

# TPU matmuls on f32 inputs default to bf16 MXU passes (~1e-2 relative
# error) — unacceptable for FEM assembly and for the f32 inner Newton of
# the plasticity kernels.  Request true-f32 precision; f64 (emulated) is
# unaffected.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: cold compiles of the while-loop-heavy
# plasticity programs take minutes through the remote TPU compile helper;
# cache hits take seconds (utils/compile_cache.py).
from .utils.compile_cache import enable_persistent_cache as _epc  # noqa: E402

_epc()

from . import sym  # noqa: E402
from .assembly import (  # noqa: E402
    DirichletBC,
    apply_lifting,
    assemble_matrix,
    assemble_scalar,
    assemble_vector,
    create_form,
    dirichletbc,
    form,
    locate_dofs_geometrical,
    locate_dofs_topological,
    set_bc,
)
from .elements import element, mixed_element, quadrature_element  # noqa: E402
from .expression import Expression  # noqa: E402
from .external_operator import (  # noqa: E402
    FEMExternalOperator,
    evaluate_external_operators,
    evaluate_operands,
    replace_external_operators,
    unique_external_operators,
)
from .function import Constant, Function  # noqa: E402
from .functionspace import DualSpace, FunctionSpace, functionspace  # noqa: E402
from .mesh import (  # noqa: E402
    Mesh,
    build_cylinder_quarter,
    build_square_with_elliptic_holes,
    create_box,
    create_interval,
    create_rectangle,
    create_unit_cube,
    create_unit_interval,
    create_unit_square,
    locate_entities_boundary,
)
from .quadrature import make_quadrature  # noqa: E402
from .sym import (  # noqa: E402
    FacetNormal,
    Form,
    Identity,
    Measure,
    SpatialCoordinate,
    TestFunction,
    TrialFunction,
    action,
    adjoint,
    as_matrix,
    as_tensor,
    as_vector,
    derivative,
    dev,
    div,
    dot,
    expand_derivatives,
    grad,
    inner,
    outer,
    sqrt,
    exp,
    ln,
    sin,
    cos,
    tan,
    arcsin,
    sign,
    sym as symmetric,
    tr,
    transpose,
)

from .dtypes import default_scalar_type, scalar_type_context  # noqa: E402

from . import parallel  # noqa: E402
from . import petsc  # noqa: E402  (solver-shim namespace, reference parity)
from . import solvers  # noqa: E402

__all__ = [
    # reference-parity 8
    "DualSpace",
    "FEMExternalOperator",
    "FunctionSpace",
    "evaluate_external_operators",
    "evaluate_operands",
    "functionspace",
    "petsc",
    "replace_external_operators",
    # substrate
    "Mesh", "create_unit_square", "create_rectangle", "create_unit_interval",
    "create_interval", "create_unit_cube", "create_box",
    "build_cylinder_quarter", "build_square_with_elliptic_holes",
    "locate_entities_boundary",
    "element", "quadrature_element", "mixed_element", "make_quadrature",
    "Function", "Constant", "Expression",
    "TestFunction", "TrialFunction", "Measure", "Form",
    "SpatialCoordinate", "FacetNormal", "Identity",
    "grad", "div", "inner", "dot", "outer", "tr", "dev", "transpose",
    "symmetric", "sqrt", "exp", "ln", "sin", "cos", "tan", "arcsin",
    "sign", "as_vector", "as_matrix", "as_tensor",
    "derivative", "expand_derivatives", "action", "adjoint",
    "assemble_scalar", "assemble_vector", "assemble_matrix",
    "create_form", "form",
    "DirichletBC", "dirichletbc", "locate_dofs_topological",
    "locate_dofs_geometrical", "apply_lifting", "set_bc",
    "solvers", "sym", "unique_external_operators",
    "parallel", "scalar_type_context", "default_scalar_type",
]

__version__ = "0.1.0"
