"""(populated as the build proceeds)"""
