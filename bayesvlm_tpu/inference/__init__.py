from bayesvlm_tpu.inference.metrics import (
    accuracy,
    nlpd,
    expected_calibration_error,
    evaluate_prediction,
)

__all__ = [
    "accuracy",
    "nlpd",
    "expected_calibration_error",
    "evaluate_prediction",
]
