"""Multimodal QA benchmark harness (reference benchmark/multimodal/).

Layout mirrors the reference's adapter boundary (README.md "Adapter
Boundary"): dataset/task code in video_qa.py / image_qa.py, model glue in
adapters.py, shared MCQ parsing in choice_parsing.py.

Environment reality (offline TPU image): no vision checkpoints or video
datasets can be downloaded, so the vision-tower adapters gate loudly with
the exact missing pieces, while the ``engine_text`` adapter — the
subtitle/caption text path the reference also evaluates (Video-MME
--use_subtitles) — runs end-to-end against the production engine today.
"""
