"""Cluster/launcher configuration stub (reference experiment_utils/config.py):
constants consumed by launch tooling."""
import os

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(BASE_DIR, 'data')
DOCKER_IMAGE = ''
S3_BUCKET = ''
TPU_TOPOLOGY = os.environ.get('LTA_TPU_TOPOLOGY', 'v5p-8')
