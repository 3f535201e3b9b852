"""Structured Streaming front end.

The reference is a strictly daily batch (cron ``0 0 * * *`` —
``/root/reference/dags/get_securities_data.py:73``); this package is its
streaming re-expression per SURVEY.md §2.9: the landing directory becomes
a file source, the daily run becomes ``Trigger.AvailableNow``, idempotent
re-loads become the file-sink commit log + checkpoint, and the analytics
that would re-run per day become watermarked incremental aggregations.
"""
