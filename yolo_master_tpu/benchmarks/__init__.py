from .suite import BenchmarkSuite, run_suite

__all__ = ["BenchmarkSuite", "run_suite"]
