"""Download and unpack the HadCRUT5 200-member analysis ensemble.

CLI equivalent of
``/root/reference/data_download/HadCRUT5_download_and_processing.py``:
fetches the MetOffice HadCRUT 5 analysis-ensemble zips and unpacks them.
Network access is required; in an air-gapped environment the bundled
``experiments/data/obs`` files are the offline substitute.

Usage:
    python data_download/hadcrut5_download.py OUT_DIR
"""

import argparse
import os
import urllib.request
import zipfile

BASE = (
    "https://www.metoffice.gov.uk/hadobs/hadcrut5/data/current/analysis/"
    "HadCRUT.5.0.1.0.analysis.anomalies.{lo}_to_{hi}_netcdf.zip"
)
MEMBER_CHUNKS = [(i, i + 9) for i in range(1, 200, 10)]


def download(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    for lo, hi in MEMBER_CHUNKS:
        url = BASE.format(lo=lo, hi=hi)
        dest = os.path.join(out_dir, os.path.basename(url))
        if not os.path.exists(dest):
            print(f"fetching {url}")
            # Download to a temp name and rename on success: an interrupted
            # urlretrieve straight to dest leaves a truncated zip that every
            # rerun then treats as complete and crashes on.
            tmp = dest + ".part"
            try:
                urllib.request.urlretrieve(url, tmp)
                os.replace(tmp, dest)
            except OSError as e:
                if os.path.exists(tmp):
                    os.remove(tmp)
                raise SystemExit(
                    f"download failed ({e}); this environment may be "
                    "air-gapped — use the bundled experiments/data/obs files"
                )
        try:
            with zipfile.ZipFile(dest) as z:
                z.extractall(out_dir)
        except zipfile.BadZipFile:
            os.remove(dest)
            raise SystemExit(
                f"{dest} was corrupt (removed); re-run to fetch it again"
            )
        print(f"unpacked {dest}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    args = ap.parse_args()
    download(args.out_dir)


if __name__ == "__main__":
    main()
