"""Perception: detection backbones, YOLO heads, RoIAlign feature
extraction, ReID appearance encoder, text encoder."""
