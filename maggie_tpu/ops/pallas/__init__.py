from .unknown import compute_unknown_pallas  # noqa: F401
