"""SLAM core: tracking, mapping, keyframing, orchestration."""
