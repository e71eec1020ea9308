"""Engine operators: index build, search/scoring, incremental merge, pipeline extras."""
