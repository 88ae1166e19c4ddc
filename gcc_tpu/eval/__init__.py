from gcc_tpu.eval.orchestrators import evaluate_engine  # noqa: F401
