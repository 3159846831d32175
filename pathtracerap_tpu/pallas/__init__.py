from .trace import trace_pallas

__all__ = ["trace_pallas"]
