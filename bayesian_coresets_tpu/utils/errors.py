"""Error types (reference: bayesiancoresets/util/errors.py:1).

``NumericalPrecisionError`` survives as a *host-side* error for eager-path
validation (e.g. a projection matrix with zero norm handed to a solver
factory).  Inside jitted loops the same condition is a boolean status flag in
the solver state (``SNNLSState.done`` / ``fail_count``) — exceptions cannot
cross the XLA boundary, and ``lax.cond`` state machines replace the
reference's try/except rollback (reference snnls/snnls.py:40-74).
"""


class NumericalPrecisionError(Exception):
    """Raised on the host path when numeric limits make progress impossible."""
