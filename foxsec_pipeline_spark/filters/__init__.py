from .event_filter import apply_event_filter, compile_event_filter  # noqa: F401
