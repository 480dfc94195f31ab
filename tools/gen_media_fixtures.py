#!/usr/bin/env python3
"""One-off harness: emit REAL encoded image fixtures (JPEG/PNG/GIF/BMP
via the JDK's javax.imageio — no Python imaging library exists in this
container) with known dimensions, for testing the dependency-free
header codecs in lucene_solr_spark/multimodal/blobs.py.

Writes tests/fixtures/media/img_*.{jpg,png,gif,bmp} + manifest.json
({file: [width, height]}).  Deterministic pixel content.
"""

import json
import pathlib
import subprocess
import tempfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "tests" / "fixtures" / "media"

JAVA = r"""
import java.awt.image.BufferedImage;
import java.io.File;
import javax.imageio.ImageIO;

public class GenImages {
    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        int[][] dims = {{37, 23}, {640, 480}, {1, 1}, {301, 999}};
        String[] fmts = {"jpg", "png", "gif", "bmp"};
        for (int[] d : dims) {
            BufferedImage img = new BufferedImage(
                d[0], d[1], BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < d[1]; y++)
                for (int x = 0; x < d[0]; x++)
                    img.setRGB(x, y, ((x * 7 + y * 13) & 0xFF) * 0x010101);
            for (String f : fmts) {
                File out = new File(dir,
                    "img_" + d[0] + "x" + d[1] + "." + f);
                if (!ImageIO.write(img, f, out))
                    throw new RuntimeException("no writer for " + f);
            }
        }
        // grayscale PNG (color type 0 -> 1 channel)
        BufferedImage g = new BufferedImage(
            55, 44, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < 44; y++)
            for (int x = 0; x < 55; x++)
                g.setRGB(x, y, ((x + y) & 0xFF) * 0x010101);
        ImageIO.write(g, "png", new File(dir, "img_gray_55x44.png"));
        ImageIO.write(g, "jpg", new File(dir, "img_gray_55x44.jpg"));
    }
}
"""


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        src = pathlib.Path(td) / "GenImages.java"
        src.write_text(JAVA)
        subprocess.run(["javac", str(src)], cwd=td, check=True)
        subprocess.run(["java", "GenImages", str(OUT)], cwd=td,
                       check=True)
    manifest = {}
    for p in sorted(OUT.glob("img_*")):
        stem = p.stem.replace("img_", "").replace("gray_", "")
        w, h = (int(x) for x in stem.split("x"))
        manifest[p.name] = [w, h]
    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=1))
    print(f"wrote {len(manifest)} fixtures to {OUT}")


if __name__ == "__main__":
    main()
