"""Reference-parity visualisation."""

from specenh.viz.movie import dump_frames, render_movie  # noqa: F401
from specenh.viz.plots import (  # noqa: F401
    display,
    plot_frame_view,
    plot_stages,
    plot_svd_compare,
    plot_val_loss,
    plt_spec_shot,
)
