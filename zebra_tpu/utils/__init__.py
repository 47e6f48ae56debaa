from zebra_tpu.utils.profiling import PhaseTimers, trace_context

__all__ = ["PhaseTimers", "trace_context"]
