"""Numeric core: quaternion / dual-quaternion algebra ops for TPU.

The XLA path (``seld_tpu.ops.quaternion`` / ``seld_tpu.ops.dual_quaternion``)
assembles the structured Hamilton block weight and calls
``lax.conv_general_dilated`` / ``jnp.dot`` — it is the correctness oracle and
already MXU-friendly. ``seld_tpu.ops.pallas`` holds fused kernels that avoid
materializing the 4x/8x-expanded weight.
"""

from seld_tpu.ops.hamilton import (  # noqa: F401
    assemble_dq_conv_kernel,
    assemble_dq_linear_kernel,
    assemble_q_kernel,
    get_i,
    get_j,
    get_k,
    get_modulus,
    get_normalized,
    get_r,
    hamilton_product,
    q_normalize,
    quaternion_exp,
)
from seld_tpu.ops.quaternion import (  # noqa: F401
    quaternion_conv,
    quaternion_linear,
    quaternion_conv_rotation,
    quaternion_linear_rotation,
    quaternion_rotation_kernel,
    quaternion_transpose_conv,
    quaternion_transpose_conv_rotation,
)
from seld_tpu.ops.dual_quaternion import (  # noqa: F401
    dual_quaternion_conv,
    dual_quaternion_linear,
)
from seld_tpu.ops.inits import (  # noqa: F401
    dq_quaternion_init,
    quaternion_init,
    random_init,
    unitary_init,
)
