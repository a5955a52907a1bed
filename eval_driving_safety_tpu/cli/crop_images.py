"""Vehicle-crop + CSV data-prep CLI for the dynamic-vehicle classifier.

Capability parity: /root/reference/dynamic_vehicles/crop_image.py (square
crops of side max(w, h)+4 around each labeled vehicle) and
create_{training,validation}_csv.py (label 1/0 from the `d`/`s` filename
suffix).
"""
from __future__ import annotations

import argparse
import os

from eval_driving_safety_tpu.cli.common import log
from eval_driving_safety_tpu.data.kitti import (load_image, read_label,
                                                save_image)
from eval_driving_safety_tpu.models.classifiers import (crop_vehicle,
                                                        label_from_filename)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--label_dir", required=True)
    p.add_argument("--annotation_dir", default=None,
                   help="per-line motion codes (n/0/1/-1); names crops "
                        "with the d/s suffix")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--csv", default=None, help="also write filename,label csv")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    for name in sorted(os.listdir(args.label_dir)):
        if not name.endswith(".txt"):
            continue
        fid = name.rsplit(".", 1)[0]
        img_path = os.path.join(args.image_dir, fid + ".png")
        if not os.path.exists(img_path):
            continue
        img = load_image(img_path)
        objs = read_label(os.path.join(args.label_dir, name))
        annos = None
        if args.annotation_dir:
            ap = os.path.join(args.annotation_dir, name)
            if os.path.exists(ap):
                annos = open(ap).read().splitlines()
        for i, o in enumerate(objs):
            if o.type not in ("Car", "Van", "Truck"):
                continue
            code = annos[i].strip() if annos and i < len(annos) else "0"
            if code == "n":
                continue
            suffix = "d" if code in ("1", "-1") else "s"
            crop = crop_vehicle(img, o.bbox)
            out_name = f"{fid}_{i}_{suffix}.png"
            save_image(os.path.join(args.out_dir, out_name), crop)
            rows.append((out_name, label_from_filename(out_name)))
    if args.csv:
        with open(args.csv, "w") as f:
            for name, label in rows:
                f.write(f"{name},{label}\n")
    log(f"wrote {len(rows)} crops to {args.out_dir}")


if __name__ == "__main__":
    main()
