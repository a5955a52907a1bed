from eval_driving_safety_tpu.models import resnet, vgg, fpn  # noqa: F401
