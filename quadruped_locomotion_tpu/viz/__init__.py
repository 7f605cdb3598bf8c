from .plot import LEG_COLORS, plot_preview, plot_telemetry  # noqa: F401
