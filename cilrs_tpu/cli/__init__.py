"""CLI entry points: drive, collect, train, report — mirroring the reference's
scripts (autonomous_drive.py, collect_data.py, notebook training, offline eval)
with the same flags, plus the --weather flag the reference documents but never
shipped (SURVEY.md §2.3 item 1)."""
