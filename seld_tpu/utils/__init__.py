"""Utilities: torch checkpoint import, CSV logging, misc helpers."""

from seld_tpu.utils.torch_import import import_reference_state_dict  # noqa: F401
from seld_tpu.utils.io import save_array_to_csv  # noqa: F401
from seld_tpu.utils.summary import (  # noqa: F401
    describe_model_name,
    model_summary,
    summarize_params,
)
