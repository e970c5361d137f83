from .harness import evaluate_slice, polarity_rescue, EvalResult  # noqa: F401
