"""Correction codes for labeling error-detection results.

Mirrors the reference CorrectionCode IntEnum
(/root/reference/traval/ts_utils.py:7-16). Stored as plain int columns in
Spark DataFrames (IntegerType), small negative values included.
"""

from enum import IntEnum


class CorrectionCode(IntEnum):
    """Codes and labels for labeling error detection results."""

    NO_CORRECTION = 0
    BELOW_THRESHOLD = -2
    NOT_EQUAL_VALUE = -1
    EQUAL_VALUE = 1
    ABOVE_THRESHOLD = 2
    MODIFIED_VALUE = 4
    UNKNOWN_COMPARISON_VALUE = 99


#: code -> status-name mapping used by ``get_correction_status_name``
#: (/root/reference/traval/ts_utils.py:478-491).
CODE_NAMES = {int(c): c.name for c in CorrectionCode}
