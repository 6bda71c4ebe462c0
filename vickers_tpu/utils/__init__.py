from vickers_tpu.utils.history import (
    load_history,
    moving_average,
    plot_curves,
    save_csv,
    to_series,
)

__all__ = ["load_history", "moving_average", "plot_curves", "save_csv", "to_series"]
