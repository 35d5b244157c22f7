#!/bin/bash
# Parity: reference scripts/run_print.sh - print recorded schedules for a log.
python "$(dirname "$0")/print_programs.py" "$@"
