"""Workload engines: pretrain / finetune / retrieval / visualization."""
